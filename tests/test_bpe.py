"""BPE merge-learning: distributed trajectory vs the single-process
reference, the DuckDB MATERIALIZED-CTE oracle, and the replace-kernel
semantics contract the spaced-string trick relies on."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _rows(tbl: pa.Table):
    return list(zip(tbl["step"].to_pylist(), tbl["left_sym"].to_pylist(),
                    tbl["right_sym"].to_pylist(),
                    tbl["pair_count"].to_pylist()))


def test_bpe_train_matches_reference(ray_session):
    from dude_ray.pipelines.bpe import bpe_train_reference, run_bpe_train

    got = _rows(run_bpe_train(SF))
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    want = bpe_train_reference(texts)
    assert got == want
    assert len(got) == 8
    # trajectory is greedy: counts non-increasing is NOT guaranteed
    # (merges create new pairs), but every count is positive and steps
    # are 1..n in order
    assert [s for s, *_ in got] == list(range(1, 9))
    assert all(c > 0 for *_, c in got)


def test_bpe_train_matches_duckdb_oracle(ray_session):
    from dude_ray.pipelines.bpe import bpe_train_oracle_sql, run_bpe_train

    got = _rows(run_bpe_train(SF))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = [tuple(r) for r in con.execute(bpe_train_oracle_sql()).fetchall()]
    assert got == want


def test_replace_kernel_semantics_parity():
    """The spaced-string merge is exact only because Python
    str.replace, pc.replace_substring and DuckDB replace() all scan
    left-to-right non-overlapping — lock that in, including the
    adjacent-repeat case where overlap semantics would diverge."""
    cases = [(" a  a  a  a ", " a  a ", " aa "),
             (" b  a  a  a ", " a  a ", " aa "),
             (" x  y  x  y  x ", " x  y ", " xy ")]
    con = duckdb.connect()
    for s, pat, rep in cases:
        py = s.replace(pat, rep)
        ar = pc.replace_substring(pa.array([s]), pattern=pat,
                                  replacement=rep)[0].as_py()
        du = con.execute("SELECT replace(?, ?, ?)", [s, pat, rep]).fetchone()[0]
        assert py == ar == du, (s, pat, rep, py, ar, du)


def test_bpe_reference_merge_creates_compound_symbols():
    """Sanity on the reference loop itself: learning on a corpus with
    one dominant word chain produces the expected compound merges."""
    from dude_ray.pipelines.bpe import bpe_train_reference

    texts = ["low low low low low lower lower newest newest"] * 3
    merges = bpe_train_reference(texts, n_merges=4)
    # 'lo' then 'low' must appear early: 'l o' and 'lo w' dominate
    pairs = [(l, r) for _, l, r, _ in merges]
    assert ("l", "o") in pairs
    assert ("lo", "w") in pairs


def test_bpe_encode_matches_duckdb_oracle(ray_session):
    from dude_ray.pipelines.bpe import bpe_encode_oracle_sql, run_bpe_encode

    got = sorted(run_bpe_encode(SF).to_pandas()
                 .itertuples(index=False, name=None))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = sorted(tuple(r) for r in
                  con.execute(bpe_encode_oracle_sql()).fetchall())
    assert got == want
    assert len(got) == 500


def test_bpe_encode_merges_shrink_token_count():
    """Encoding with merges must never produce MORE tokens than
    char-level (0 merges), and at least one doc must actually shrink."""
    from dude_ray.pipelines.bpe import BpeEncoder

    texts = ["the cat sat on the mat", "the dog"]
    base = BpeEncoder([])
    enc = BpeEncoder([("t", "h"), ("th", "e")])
    batch = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                      "text": pa.array(texts)})
    b0 = base(batch)["bpe_tokens"].to_pylist()
    b1 = enc(batch)["bpe_tokens"].to_pylist()
    assert all(x <= y for x, y in zip(b1, b0))
    assert b1[0] < b0[0]  # 'the' appears → both merges fire
