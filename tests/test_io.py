"""Interleaved-corpus sink shim: Lance when pylance is importable,
parquet (identical schema) otherwise — the north rule's storage format
with this sandbox's documented fallback."""

import pyarrow as pa


def test_export_spans_round_trip(ray_session, tmp_path):
    from dude_ray.io import lance_available, read_interleaved
    from dude_ray.pipelines.flagship import export_spans, run_extract

    dest = str(tmp_path / "spans_out")
    fmt = export_spans("/root/testdata/sf0.001", dest)
    assert fmt == ("lance" if lance_available() else "parquet")
    back = read_interleaved(dest)
    direct = run_extract("/root/testdata/sf0.001")
    assert back.count() == direct.count()
    # span struct field order is the per-row invariant (kind, text,
    # media_ref, offset)
    row = back.take(1)[0]
    assert {"doc_id", "spans"} <= set(row.keys())
    if row["spans"]:
        assert list(row["spans"][0].keys()) == ["kind", "text", "media_ref",
                                                "offset"]


def test_read_parquet_clean_strips_metadata(ray_session):
    from dude_ray.io import read_parquet_clean

    ds = read_parquet_clean("/root/testdata/sf0.001/documents.parquet",
                            columns=["doc_id"])
    t = pa.Table.from_pylist(ds.take(1))
    assert t.num_rows == 1
    # the projected read path must produce hashable schemas
    sch = ds.schema()
    assert sch is not None


def test_write_partitioned_resumable(ray_session, tmp_path):
    """Partial run → resume skips finished partitions (mtime unchanged),
    rewrites only missing ones, total rows preserved."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from dude_ray.io import read_parquet_clean, write_partitioned_resumable

    sf = "/root/testdata/sf0.001"
    ds = read_parquet_clean(f"{sf}/documents.parquet",
                            columns=["doc_id", "lang"])
    out = str(tmp_path / "out")
    r1 = write_partitioned_resumable(ds, out, "doc_id", num_partitions=8)
    assert r1["skipped"] == [] and len(r1["written"]) > 0

    total = pq.read_table(f"{sf}/documents.parquet").num_rows
    read_back = sum(
        pq.read_table(os.path.join(out, d, "data.parquet")).num_rows
        for d in os.listdir(out) if d.startswith("part="))
    assert read_back == total

    # simulate a crash: nuke two partitions (one without its marker)
    victims = sorted(d for d in os.listdir(out) if d.startswith("part="))[:2]
    shutil.rmtree(os.path.join(out, victims[0]))
    os.remove(os.path.join(out, victims[1], "_SUCCESS"))
    keep_mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "data.parquet"))
        for d in os.listdir(out)
        if d.startswith("part=")
        and os.path.exists(os.path.join(out, d, "_SUCCESS"))
    }

    r2 = write_partitioned_resumable(ds, out, "doc_id", num_partitions=8)
    assert sorted(r2["written"] + r2["skipped"]) == r1["written"]
    assert len(r2["written"]) == 2  # exactly the two victims
    for d, m in keep_mtimes.items():
        assert os.path.getmtime(os.path.join(out, d, "data.parquet")) == m
    read_back2 = sum(
        pq.read_table(os.path.join(out, d, "data.parquet")).num_rows
        for d in os.listdir(out) if d.startswith("part="))
    assert read_back2 == total


def test_read_table_any_formats(ray_session, tmp_path):
    """CSV and JSON-lines sources round-trip to the same rows as the
    parquet original; unsupported extensions raise."""
    import pandas as pd
    import pyarrow.parquet as pq
    import pytest

    from dude_ray.io import read_table_any

    src = pq.read_table("/root/testdata/sf0.001/events.parquet",
                        columns=["event_id", "event_type", "value"])
    df = src.to_pandas().head(200)
    df.to_csv(tmp_path / "events.csv", index=False)
    df.to_json(tmp_path / "events.jsonl", orient="records", lines=True)

    want = df.sort_values("event_id").reset_index(drop=True)
    for name in ("events.csv", "events.jsonl"):
        got = (read_table_any(str(tmp_path / name)).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)

    got = read_table_any(str(tmp_path / "events.csv"),
                         columns=["event_id", "value"]).to_pandas()
    assert sorted(got.columns) == ["event_id", "value"]

    with pytest.raises(ValueError):
        read_table_any(str(tmp_path / "events.xml"))
