"""Blocklist (C4-style badwords) filter: DuckDB-oracle parity and
whole-token match semantics."""

from __future__ import annotations

import duckdb
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_blocklist_filter_matches_duckdb_oracle(ray_session):
    from dude_ray.pipelines.cleaning import (blocklist_filter_oracle_sql,
                                             run_blocklist_filter)

    got = sorted(run_blocklist_filter(SF).to_pandas()
                 .itertuples(index=False, name=None))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = sorted(tuple(r) for r in
                  con.execute(blocklist_filter_oracle_sql()).fetchall())
    assert got == want
    assert len(got) == 500
    # the placeholder list was chosen to occur in the corpus: both
    # branches must be exercised
    assert any(not k for _d, _h, k in got)
    assert any(k for _d, _h, k in got)


def test_blocklist_whole_token_semantics(ray_session, tmp_path):
    """'error' must not match inside 'terrorless'; counts are
    occurrences, not distinct words."""
    import pyarrow.parquet as pq

    from dude_ray.pipelines.cleaning import run_blocklist_filter

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "text": pa.array(["terrorless mirror", "Error error SPAM",
                                    "clean text here"])}),
        d / "documents.parquet")
    rows = {r["doc_id"]: (r["bad_hits"], r["keep"])
            for r in run_blocklist_filter(str(d)).take_all()}
    assert rows[0] == (0, True)
    assert rows[1] == (3, False)  # 2x error + 1x spam, case-folded
    assert rows[2] == (0, True)
