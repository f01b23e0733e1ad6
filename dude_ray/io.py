"""Shared parquet ingest helper.

The driver-generated test parquet carries a ``pandas`` schema-metadata
blob; ``pa.Schema.__hash__`` raises on the nested dict inside it, which
makes Ray Data's schema-dedup path log ``Failed to hash the schemas``
on every stage (including inside the read operator's own row-group
concat) and defeats block-schema caching.  :func:`read_parquet_clean`
passes a metadata-stripped, column-projected schema straight into
``read_parquet`` so even the read tasks see hashable schemas; when the
projection can't be derived from a data file (partition columns,
no column list), it falls back to a per-block zero-copy strip stage.
"""

from __future__ import annotations

import glob
import os


def _strip_schema_metadata(batch):
    return batch.replace_schema_metadata(None)


def _one_file(paths, pattern: str = "*.parquet"):
    """First matching file (filename-sorted) when given a directory;
    the single source of truth for directory probing in this module."""
    f = paths[0] if isinstance(paths, (list, tuple)) else paths
    if isinstance(f, str) and os.path.isdir(f):
        cand = sorted(glob.glob(os.path.join(f, "**", pattern),
                                recursive=True))
        return cand[0] if cand else None
    return f


def read_parquet_clean(paths, *, columns=None, **kwargs):
    """``ray.data.read_parquet`` with hashable (metadata-free) schemas."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    if columns is not None:
        try:
            full = pq.read_schema(_one_file(paths)).remove_metadata()
            proj = pa.schema([full.field(c) for c in columns])
            return rd.read_parquet(paths, columns=columns, schema=proj,
                                   **kwargs)
        except (KeyError, OSError, TypeError):
            pass  # partition column or unreadable schema → strip stage
    ds = rd.read_parquet(paths, columns=columns, **kwargs)
    # batch_size=None → whole blocks, no concat, metadata-only rewrite
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow",
                          batch_size=None)


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def write_interleaved(ds, path: str, **kwargs) -> str:
    """Write an interleaved-document Dataset to Lance when pylance is
    importable (the north rule's storage format — ``Dataset.write_lance``
    is in this Ray build), else to parquet with the identical schema.
    The ``pip install pylance`` attempt in this sandbox fails (no
    network, 2026-08-17 — recorded in BASELINE.md), so the parquet path
    is what tests exercise; both layouts carry (doc_id, spans) with the
    span struct ordered (kind, text, media_ref, offset).  Returns the
    format written."""
    if lance_available():
        ds.write_lance(path, **kwargs)
        return "lance"
    ds.write_parquet(path, **kwargs)
    return "parquet"


def read_interleaved(path: str, **kwargs):
    """Read an interleaved corpus written by :func:`write_interleaved`."""
    import ray.data as rd

    if os.path.isdir(path) and glob.glob(os.path.join(path, "**", "*.lance"),
                                         recursive=True):
        return rd.read_lance(path, **kwargs)
    return read_parquet_clean(path, **kwargs)


def write_partitioned_resumable(ds, out_dir: str, key_col: str,
                                num_partitions: int = 64) -> dict:
    """Hash-partitioned, per-partition-atomic, resumable parquet sink.

    Rows are routed to ``num_partitions`` buckets by a deterministic
    hash of ``key_col``; each bucket is written by its own task to
    ``part=K/data.parquet`` via tmp-file + atomic rename, with a
    ``part=K/_SUCCESS`` marker committed after the rename.  A re-run
    first scans the (tiny) marker set on the driver and drops finished
    buckets from the stream BEFORE the shuffle, so recovering a job
    that died 90% through re-reads the input but re-writes only the
    missing 10% — never one giant file, never a half-written partition
    visible to readers.

    Returns {"written": [...], "skipped": [...]} bucket ids.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    finished = {
        int(d.split("=", 1)[1])
        for d in os.listdir(out_dir)
        if d.startswith("part=")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
    }

    mask_mod = np.uint64(num_partitions)

    def _route(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if pa.types.is_integer(keys.type):
            import pyarrow.compute as pc_

            raw = pc_.cast(keys, pa.int64()).to_numpy(
                zero_copy_only=False).astype(np.uint64)
            # splitmix-style avalanche so sequential ids spread
            raw ^= raw >> np.uint64(33)
            with np.errstate(over="ignore"):
                raw *= np.uint64(0xFF51AFD7ED558CCD)
            raw ^= raw >> np.uint64(33)
            part = (raw % mask_mod).astype(np.int64)
        else:
            import hashlib as _h

            part = np.fromiter(
                (int(_h.md5(str(v).encode()).hexdigest()[:8], 16)
                 % num_partitions for v in keys.to_pylist()),
                dtype=np.int64, count=len(batch))
        t = batch.append_column("__part", pa.array(part, type=pa.int64()))
        if finished:
            t = t.filter(pa.array(~np.isin(part, list(finished))))
        return t

    def _write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["__part"].iloc[0])
        pdir = os.path.join(out_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        dst = os.path.join(pdir, "data.parquet")
        tbl = pa.Table.from_pandas(
            g.drop(columns="__part"), preserve_index=False)
        pq.write_table(tbl, tmp)
        os.replace(tmp, dst)  # atomic on POSIX
        with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
            f.write(str(len(g)))
        return pd.DataFrame({"part": [part], "rows": [len(g)]})

    routed = ds.map_batches(_route, batch_format="pyarrow",
                            batch_size=8192)
    written = sorted(r["part"] for r in routed.groupby("__part").map_groups(
        _write_bucket, batch_format="pandas").take_all())
    return {"written": written, "skipped": sorted(finished)}


def read_table_any(path, *, columns=None, **kwargs):
    """Format-dispatching source reader: parquet (metadata-cleaned),
    CSV, and JSON-lines, by extension (a directory dispatches on its
    first file).  Column projection is pushed into the parquet reader;
    for CSV/JSON it is applied as a zero-copy select stage after the
    read (those readers have no projection pushdown in this Ray
    version)."""
    import ray.data as rd

    probe = _one_file(path, pattern="*.*") or path
    ext = os.path.splitext(str(probe))[1].lower()
    if ext in ("", ".parquet"):
        return read_parquet_clean(path, columns=columns, **kwargs)
    if ext == ".csv":
        ds = rd.read_csv(path, **kwargs)
    elif ext in (".json", ".jsonl"):
        ds = rd.read_json(path, **kwargs)
    else:
        raise ValueError(f"unsupported source format: {ext!r}")
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds
