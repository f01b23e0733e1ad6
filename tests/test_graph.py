"""Distributed PageRank vs a single-process numpy power iteration."""

from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.001"


def test_pagerank_matches_reference(ray_session):
    from dude_ray.pipelines.graph import (link_edges, pagerank_reference,
                                          run_pagerank)

    pr = run_pagerank(SF, iters=6).to_pandas()
    edges, nodes = link_edges(SF)
    el = [(r["src"], r["dst"]) for r in edges.take_all()]
    nl = [r["node"] for r in nodes.take_all()]
    assert len(pr) == len(nl)
    # probability distribution over all corpus pages
    assert abs(pr["rank"].sum() - 1.0) < 1e-9
    assert (pr["rank"] > 0).all()
    ref = pagerank_reference(el, nl, iters=6)
    got = dict(zip(pr["node"], pr["rank"]))
    assert max(abs(got[n] - ref[n]) for n in nl) < 1e-12


def test_graph_pagerank_matches_reference(ray_session):
    """Relational-graph variant (the DuckDB-oracled one) against the
    same independent numpy power iteration, edge set rebuilt with
    pandas from the raw parquet."""
    import pandas as pd

    from dude_ray.pipelines.graph import (pagerank_reference,
                                          run_graph_pagerank)

    pr = run_graph_pagerank(SF, iters=4).to_pandas()
    orders = pd.read_parquet(SF + "/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    li = pd.read_parquet(SF + "/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    el = sorted({("c%d" % c, "s%d" % s)
                 for c, s in zip(m["o_custkey"], m["l_suppkey"])})
    cust = pd.read_parquet(SF + "/customer.parquet", columns=["c_custkey"])
    supp = pd.read_parquet(SF + "/supplier.parquet", columns=["s_suppkey"])
    nl = (["c%d" % c for c in cust["c_custkey"]]
          + ["s%d" % s for s in supp["s_suppkey"]])
    assert len(pr) == len(nl)
    assert abs(pr["rank"].sum() - 1.0) < 1e-6
    ref = pagerank_reference(el, nl, iters=4)
    got = dict(zip(pr["node"], pr["rank"]))
    assert max(abs(got[n] - ref[n]) for n in nl) < 1e-9


def test_pagerank_tiers_agree(ray_session):
    """All three planner tiers (driver-numpy, distributed scatter,
    per-iteration hash joins) produce the same ranks on the same
    graph."""
    from dude_ray.pipelines.graph import link_edges, pagerank_kernel

    edges, nodes = link_edges(SF)
    local = pagerank_kernel(edges, nodes, iters=4).to_pandas()
    scatter = pagerank_kernel(edges, nodes, iters=4,
                              scatter_local_threshold=0).to_pandas()
    joins = pagerank_kernel(edges, nodes, iters=4,
                            broadcast_threshold=0).to_pandas()
    base = local.set_index("node")["rank"].sort_index()
    for other in (scatter, joins):
        o = other.set_index("node")["rank"].sort_index()
        assert len(o) == len(base)
        assert np.max(np.abs(o.to_numpy() - base.to_numpy())) < 1e-12


def test_oracle_edge_list_matches_engine(ray_session):
    """The SQL oracle's Python-side edge list (pure function of
    n_docs — corpus_link_edges_py) must equal the engine's
    HTML-extraction-derived link_edges() exactly, multiplicity
    included — the invariant pagerank's DuckDB hash-match rests on."""
    import pyarrow.parquet as pq
    from collections import Counter

    from dude_ray.pipelines.graph import corpus_link_edges_py, link_edges
    from dude_ray.sources.corpus import host_boundaries, host_of, url_for

    n_docs = pq.read_metadata(SF + "/documents.parquet").num_rows
    bounds, eids = corpus_link_edges_py(n_docs)
    py = Counter((url_for(s, host_of(s, bounds)),
                  url_for(t, host_of(t, bounds))) for s, t in eids)
    edges, _nodes = link_edges(SF)
    engine = Counter((r["src"], r["dst"]) for r in edges.take_all())
    assert py == engine and len(engine) > 0


def test_pagerank_prefers_linked_pages(ray_session):
    """Pages with incoming links must outrank the dangling floor."""
    from dude_ray.pipelines.graph import link_edges, run_pagerank

    pr = run_pagerank(SF, iters=6).to_pandas()
    edges, _nodes = link_edges(SF)
    linked = {r["dst"] for r in edges.take_all()}
    got = pr.set_index("node")["rank"]
    floor = got[~got.index.isin(linked)]
    if len(floor) and len(linked):
        assert got[got.index.isin(linked)].mean() > floor.mean()
        assert np.isclose(floor.to_numpy(), floor.iloc[0]).all()


def test_graph_hits_matches_reference(ray_session):
    """HITS against an independent numpy implementation, edge set
    rebuilt with pandas from the raw parquet; authorities live on
    suppliers, hubs on customers, each side L1-normalized."""
    import pandas as pd

    from dude_ray.pipelines.graph import hits_reference, run_graph_hits

    got = run_graph_hits(SF, iters=4).to_pandas()
    orders = pd.read_parquet(SF + "/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    li = pd.read_parquet(SF + "/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    el = sorted({("c%d" % c, "s%d" % s)
                 for c, s in zip(m["o_custkey"], m["l_suppkey"])})
    cust = pd.read_parquet(SF + "/customer.parquet", columns=["c_custkey"])
    supp = pd.read_parquet(SF + "/supplier.parquet", columns=["s_suppkey"])
    nl = (["c%d" % c for c in cust["c_custkey"]]
          + ["s%d" % s for s in supp["s_suppkey"]])
    assert len(got) == len(nl)
    assert abs(got["auth"].sum() - 1.0) < 1e-6
    assert abs(got["hub"].sum() - 1.0) < 1e-6
    # structure: only suppliers hold authority, only customers hub mass
    assert (got.loc[got["node"].str.startswith("s"), "hub"] == 0).all()
    assert (got.loc[got["node"].str.startswith("c"), "auth"] == 0).all()
    ref = hits_reference(el, nl, iters=4)
    gm = {r["node"]: (r["auth"], r["hub"])
          for r in got.to_dict("records")}
    err = max(max(abs(gm[n][0] - ref[n][0]), abs(gm[n][1] - ref[n][1]))
              for n in nl)
    assert err < 1e-9


def test_hits_tiers_agree(ray_session):
    """All three planner tiers (driver-numpy, distributed scatter,
    per-half-step hash joins) produce the same HITS scores."""
    from dude_ray.pipelines.graph import _cust_supp_graph, hits_kernel

    edges, nodes = _cust_supp_graph(SF)
    local = hits_kernel(edges, nodes, iters=3).to_pandas()
    scatter = hits_kernel(edges, nodes, iters=3,
                          local_threshold=0).to_pandas()
    joins = hits_kernel(edges, nodes, iters=3,
                        broadcast_threshold=0).to_pandas()
    base = local.set_index("node").sort_index()
    for other in (scatter, joins):
        o = other.set_index("node").sort_index()
        assert len(o) == len(base)
        for col in ("auth", "hub"):
            assert np.max(np.abs(o[col].to_numpy()
                                 - base[col].to_numpy())) < 1e-12


def test_knn_triangles_matches_bruteforce(ray_session):
    """Triangle counts equal a single-process brute-force recount over
    the SAME kNN edge set (isolates the wedge/close machinery from the
    kNN construction), and the tagged-stream reduce is group-width
    invariant."""
    from collections import defaultdict
    from itertools import combinations

    from dude_ray.pipelines.graph import run_knn_triangles
    from dude_ray.pipelines.similarity import run_knn_graph

    sf = "/root/testdata/sf0.001"
    edges = set()
    for r in run_knn_graph(sf).take_all():
        a, b = sorted((r["src"], r["dst"]))
        edges.add((a, b))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = defaultdict(int)
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c: count each triangle once
                for n in (a, b, c):
                    want[n] += 1
    assert sum(want.values()) % 3 == 0 and len(want) > 0

    for width in (64, 65536):
        got = {r["node"]: r["n_triangles"]
               for r in run_knn_triangles(
                   sf, target_rows_per_group=width).take_all()}
        assert got == dict(want)


def test_graph_degree_dist_local_oracle(ray_session):
    """The in/out-degree histogram equals the DuckDB inlined-edge
    recompute at sf0.001 exactly, and each side's histogram sums to
    the full node universe (zero-degree rows included)."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from dude_ray.pipelines.graph import (run_graph_degree_dist,
                                          graph_degree_dist_oracle_sql)

    sf = "/root/testdata/sf0.001"
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(graph_degree_dist_oracle_sql(sf)).df()
            .reset_index(drop=True))
    for side in ("in", "out"):
        assert want.loc[want["side"] == side, "n_nodes"].sum() == n_docs

    got = run_graph_degree_dist(sf).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_cocitation_local_oracle(ray_session):
    """Top co-cited pairs equal the DuckDB inlined-edge recompute at
    sf0.001 across both hash_grouped_reduce tiers; page_a < page_b and
    ranks are dense from 1."""
    import duckdb
    import pandas as pd

    from dude_ray.pipelines.graph import (run_cocitation,
                                          cocitation_oracle_sql)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(cocitation_oracle_sql(sf)).df()
            .reset_index(drop=True))
    assert (want["page_a"] < want["page_b"]).all()
    assert list(want["rank"]) == list(range(1, len(want) + 1))

    for trg in (64, 1 << 22):
        got = (run_cocitation(sf, target_rows_per_group=trg)
               .to_pandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)


def test_anchor_list_matches_engine(ray_session):
    """corpus_link_anchors_py (the inlined oracle input) equals the
    engine's extracted link spans — target canonicalization AND anchor
    texts — at sf0.001, so the anchor_texts SQL oracle checks the real
    extraction path, not a parallel reimplementation drift."""
    from collections import Counter

    import pyarrow.parquet as pq

    from dude_ray.canonical import LinkCanonicalizer
    from dude_ray.pipelines.flagship import run_extract
    from dude_ray.pipelines.graph import corpus_link_anchors_py

    sf = "/root/testdata/sf0.001"
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    want = Counter(corpus_link_anchors_py(n_docs))

    got: Counter = Counter()
    for row in run_extract(sf).take_all():
        canon = LinkCanonicalizer(row["doc_id"])
        for s in row["spans"]:
            if s["kind"] == "link" and s["media_ref"]:
                got[(canon(s["media_ref"]), s["text"] or "")] += 1
    assert got == want


def test_anchor_texts_local_oracle(ray_session):
    """run_anchor_texts equals the DuckDB inlined-list recompute at
    sf0.001 exactly (the rows-only -> SQL-checked upgrade)."""
    import duckdb
    import pandas as pd

    from dude_ray.pipelines.flagship import run_anchor_texts
    from dude_ray.pipelines.graph import anchor_texts_oracle_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    want = (con.execute(anchor_texts_oracle_sql(sf)).df()
            .sort_values("target").reset_index(drop=True))
    got = (run_anchor_texts(sf).to_pandas()
           .sort_values("target").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_coupling_local_oracle(ray_session):
    """Top bibliographically-coupled pairs equal the DuckDB
    inlined-edge recompute at sf0.001 across both hash_grouped_reduce
    tiers (the co-citation dual, keyed on dst)."""
    import duckdb
    import pandas as pd

    from dude_ray.pipelines.graph import run_coupling, coupling_oracle_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(coupling_oracle_sql(sf)).df()
            .reset_index(drop=True))
    assert (want["page_a"] < want["page_b"]).all()

    for trg in (64, 1 << 22):
        got = (run_coupling(sf, target_rows_per_group=trg)
               .to_pandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)


def test_adamic_adar_local_oracle(ray_session):
    """Top Adamic-Adar pairs equal the DuckDB inlined-edge recompute
    at sf0.001 across both hash_grouped_reduce tiers; no reported
    pair is an existing edge and ranks are dense from 1."""
    import duckdb
    import pandas as pd

    from dude_ray.pipelines.components import _graph_sql_parts
    from dude_ray.pipelines.graph import (adamic_adar_oracle_sql,
                                          run_adamic_adar)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(adamic_adar_oracle_sql(sf)).df()
            .reset_index(drop=True))
    assert (want["page_a"] < want["page_b"]).all()
    assert list(want["rank"]) == list(range(1, len(want) + 1))
    assert (want["aa"] > 0).all()

    preamble, _b, _n = _graph_sql_parts(sf)
    edges = con.execute(f"""
        WITH {preamble}
        SELECT least(na.node, nb.node) AS x,
               greatest(na.node, nb.node) AS y
        FROM (SELECT DISTINCT src_id, dst_id FROM edges0) e
        JOIN nodes na ON na.id = e.src_id
        JOIN nodes nb ON nb.id = e.dst_id
    """).df()
    edge_set = set(zip(edges["x"], edges["y"]))
    assert not any((a, b) in edge_set
                   for a, b in zip(want["page_a"], want["page_b"]))

    for trg in (64, 1 << 22):
        got = (run_adamic_adar(sf, target_rows_per_group=trg)
               .to_pandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)
