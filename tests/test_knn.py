"""Exact kNN-graph: distributed blocked pair join vs a single-process
numpy reference, the DuckDB brute-force oracle, and row-group-blocking
invariance (the partial top-k must be a lossless superset at any block
layout)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _rows(res) -> list[tuple]:
    tbl = res.to_pandas() if hasattr(res, "to_pandas") else res
    return sorted(zip(tbl["src"].tolist(), tbl["rank"].tolist(),
                      tbl["dst"].tolist(), tbl["sim"].tolist()))


def _numpy_reference(path: str, k: int = 5) -> list[tuple]:
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    emb = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    sims = emb @ emb.T
    np.fill_diagonal(sims, -np.inf)
    out = []
    for i in range(len(vid)):
        order = np.lexsort((vid, -sims[i]))[:k]
        for r, j in enumerate(order, 1):
            out.append((int(vid[i]), r, int(vid[j]),
                        float(np.round(sims[i, j], 4))))
    return sorted(out)


def test_knn_graph_matches_numpy_reference(ray_session):
    from dude_ray.pipelines.similarity import run_knn_graph

    got = _rows(run_knn_graph(SF))
    want = _numpy_reference(f"{SF}/embeddings.parquet")
    assert got == want
    # every vector has exactly k neighbors (n > k here)
    srcs = [s for s, *_ in got]
    assert len(got) == len(set(srcs)) * 5


def test_knn_graph_matches_duckdb_oracle(ray_session):
    from dude_ray.pipelines.similarity import (knn_graph_oracle_sql,
                                               run_knn_graph)

    got = _rows(run_knn_graph(SF))
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    want = sorted((int(s), int(r), int(d), float(v)) for s, d, v, r in
                  con.execute(knn_graph_oracle_sql()).fetchall())
    assert got == want


def test_knn_graph_block_layout_invariance(ray_session, tmp_path):
    """Re-writing the table as many small row groups (the multi-block
    pair-join path the sf tables' single row group never exercises)
    must produce the identical graph."""
    from dude_ray.pipelines.similarity import run_knn_graph

    t = pq.read_table(f"{SF}/embeddings.parquet")
    small = tmp_path / "sf"
    small.mkdir()
    pq.write_table(t, small / "embeddings.parquet", row_group_size=64)
    assert pq.ParquetFile(small / "embeddings.parquet").num_row_groups > 4
    got = _rows(run_knn_graph(str(small)))
    want = _rows(run_knn_graph(SF))
    assert got == want


def test_knn_graph_tie_superset_partial():
    """The local partial keeps ALL boundary ties: with duplicate
    vectors the k-th-best sim repeats, and dropping an arbitrary tie
    in the partial would lose the (sim DESC, dst ASC) winner."""
    from dude_ray.pipelines.similarity import _BlockKnnJoin

    j = _BlockKnnJoin(k=1)
    svid = np.array([10], dtype=np.int64)
    dvid = np.array([3, 2, 7], dtype=np.int64)
    sims = np.array([[0.5, 0.5, 0.1]])
    out: tuple = ([], [], [])
    j._side(svid, sims, dvid, out)
    kept = sorted(zip(out[0][0].tolist(), out[1][0].tolist()))
    # both ties survive the partial; the global reduce picks dst=2
    assert kept == [(10, 2), (10, 3)]


def test_knn_accuracy_local_oracle(ray_session):
    """Per-label 1-NN accuracy equals the DuckDB brute-force
    recompute at sf0.001; counts cover every vector and acc lies in
    [0, 1]."""
    import duckdb
    import pandas as pd

    from dude_ray.pipelines.similarity import (knn_accuracy_oracle_sql,
                                               run_knn_accuracy)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    want = (con.execute(knn_accuracy_oracle_sql()).df()
            .reset_index(drop=True))
    got = run_knn_accuracy(sf).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
    n_vec = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert int(got["n"].sum()) == n_vec
    assert got["acc"].between(0.0, 1.0).all()
