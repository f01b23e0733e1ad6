"""Count-Min sketch: register-state oracle parity, one-sided point
estimates, and batch-layout merge invariance."""

from __future__ import annotations

import duckdb
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _cells(res) -> dict:
    return {(r["d"], r["idx"]): r["c"] for r in res.take_all()}


def test_cms_registers_match_duckdb_oracle(ray_session):
    from dude_ray.pipelines.sketches import (cms_registers_oracle_sql,
                                             run_cms_registers)

    got = sorted(_cells(run_cms_registers(SF)).items())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = sorted(((r[0], r[1]), r[2]) for r in
                  con.execute(cms_registers_oracle_sql()).fetchall())
    assert got == want


def test_cms_point_estimate_one_sided(ray_session):
    """CMS never under-counts: estimate >= exact count for every word
    in the corpus head, and total mass per depth equals the token
    count."""
    import re

    import pyarrow.parquet as pq

    from dude_ray.pipelines.sketches import (CMS_D, cms_estimate,
                                             run_cms_registers)
    from dude_ray.pipelines.textops import TOKEN_RE

    cells = _cells(run_cms_registers(SF))
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    tok = re.compile(TOKEN_RE)
    cnt: dict = {}
    for t in texts:
        for w in tok.findall((t or "").lower()):
            cnt[w] = cnt.get(w, 0) + 1
    for w, c in list(cnt.items())[:50]:
        assert cms_estimate(cells, w) >= c
    n_tokens = sum(cnt.values())
    for d in range(CMS_D):
        assert sum(v for (dd, _i), v in cells.items() if dd == d) == n_tokens


def test_cms_batch_layout_invariance(ray_session):
    """The register state is a sum of per-batch partials — any batch
    size must merge to the identical state."""
    from dude_ray.pipelines.sketches import run_cms_registers

    a = _cells(run_cms_registers(SF, batch_size=64))
    b = _cells(run_cms_registers(SF, batch_size=4096))
    assert a == b
