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
