"""PMI collocations: DuckDB-oracle parity (the shared left-associated
float64 score tree), a planted-collocation sanity check, and marginal
-filter safety."""

from __future__ import annotations

import duckdb
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _rows(t: pa.Table):
    return list(zip(t["rank"].to_pylist(), t["x"].to_pylist(),
                    t["y"].to_pylist(), t["pair_count"].to_pylist(),
                    t["lift"].to_pylist()))


def test_pmi_matches_duckdb_oracle(ray_session):
    from dude_ray.pipelines.textops import (pmi_collocations_oracle_sql,
                                            run_pmi_collocations)

    got = _rows(run_pmi_collocations(SF))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = [(r[4], r[0], r[1], r[2], r[3]) for r in
            con.execute(pmi_collocations_oracle_sql()).fetchall()]
    assert got == want
    assert len(got) == 100
    assert [r[0] for r in got] == list(range(1, 101))
    # lift is bit-identical, so it must be non-increasing down the ranks
    lifts = [r[4] for r in got]
    assert all(a >= b for a, b in zip(lifts, lifts[1:]))


def test_pmi_planted_collocation_ranks_first(ray_session, tmp_path):
    """A bigram that ALWAYS co-occurs ('zqx wvk') while its words never
    appear apart maximizes lift and must outrank filler pairs."""
    import pyarrow.parquet as pq

    from dude_ray.pipelines.textops import run_pmi_collocations

    # per-doc-unique filler words: every filler bigram appears once
    # (below min_count) while 'zqx wvk' co-occurs in all 10 docs
    docs = [f"zqx wvk f{i}a f{i}b f{i}c" for i in range(10)]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": pa.array(docs)}),
        d / "documents.parquet")
    t = run_pmi_collocations(str(d), min_count=5, top_k=10)
    rows = _rows(t)
    assert (rows[0][1], rows[0][2]) == ("zqx", "wvk")
    assert rows[0][3] == 10
    # every filler bigram fell below min_count — only the planted
    # collocation survives
    assert len(rows) == 1
