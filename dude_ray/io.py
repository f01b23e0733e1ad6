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


def _one_file(paths):
    f = paths[0] if isinstance(paths, (list, tuple)) else paths
    if isinstance(f, str) and os.path.isdir(f):
        cand = sorted(glob.glob(os.path.join(f, "**", "*.parquet"),
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
