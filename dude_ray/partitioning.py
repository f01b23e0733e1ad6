"""Data-scaled partitioning widths.

Every coarse-grained ``groupby().map_groups`` in this repo dispatches
one task per *group of keys* rather than one per key.  A FIXED group
count (``& 31``, ``% 64``) is correct but concentrates 1/32-1/64 of
the dataset in a single task at any scale — fine at sf0.1, an OOM at
100 TB.  These helpers derive the group count from the input size so
no task ever receives more than ~``target_rows_per_group`` rows in
expectation, while small inputs keep a floor wide enough for full
cluster parallelism.

The row estimate is planner-style: parquet footer ``num_rows`` over a
bounded sample of files, extrapolated — O(sampled footers) driver
work, no Ray job, no data read.
"""

from __future__ import annotations

import glob
import os


def estimate_rows(paths, sample_files: int = 64) -> int:
    """Row-count estimate from parquet footers.

    Reads at most ``sample_files`` footers and extrapolates by file
    count (single-footer metadata reads, the same information any
    query planner uses).  Returns 0 when nothing matches.
    """
    import pyarrow.parquet as pq

    if isinstance(paths, (list, tuple)):
        cands = list(paths)
    else:
        cands = [paths]
    files: list[str] = []
    for p in cands:
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(
                os.path.join(p, "**", "*.parquet"), recursive=True)))
        else:
            files.append(p)
    if not files:
        return 0
    take = files[:sample_files]
    try:
        n = sum(pq.read_metadata(f).num_rows for f in take)
    except OSError:
        return 0
    return int(n * len(files) / len(take))


def parquet_row_groups(paths) -> list[tuple[str, int, int]]:
    """(file, row_group_index, num_rows) for every row group under
    ``paths`` — the natural block unit for blocked pair joins (footer
    metadata only; no data read)."""
    import pyarrow.parquet as pq

    if isinstance(paths, (list, tuple)):
        cands = list(paths)
    else:
        cands = [paths]
    files: list[str] = []
    for p in cands:
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(
                os.path.join(p, "**", "*.parquet"), recursive=True)))
        else:
            files.append(p)
    out: list[tuple[str, int, int]] = []
    for f in files:
        meta = pq.read_metadata(f)
        for rg in range(meta.num_row_groups):
            out.append((f, rg, meta.row_group(rg).num_rows))
    return out


def scaled_group_count(n_rows: int, target_rows_per_group: int,
                       lo: int = 64, hi: int = 1 << 20) -> int:
    """Power-of-two group count for a coarse ``map_groups`` dispatch.

    Sized so a group receives ~``target_rows_per_group`` rows in
    expectation (uniform keys; salt hot keys separately).  ``lo`` keeps
    small inputs parallel across the cluster; ``hi`` bounds groupby key
    cardinality (and must not exceed the key's own bit width when the
    group id is a bitmask of a hash/LSH key).
    """
    want = max(lo, -(-max(n_rows, 1) // max(target_rows_per_group, 1)))
    n = lo
    while n < want and n < hi:
        n <<= 1
    return min(n, hi)


def parquet_sorted_by(path: str, key: str) -> bool:
    """True iff the parquet input is PROVABLY globally sorted by
    ``key``: per-row-group min/max statistics, read in filename +
    row-group order (the order ``read_parquet`` emits blocks), are
    non-overlapping and monotone.  A metadata-only check — O(row
    groups), no data read — that lets sort-requiring operators skip an
    all-to-all when the writer already ordered the data (the common
    case for snapshot/export tables at scale)."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    if _os.path.isdir(path):
        files = sorted(_glob.glob(_os.path.join(path, "**", "*.parquet"),
                                  recursive=True))
    else:
        files = [path]
    prev_max = None
    for f in files:
        meta = pq.read_metadata(f)
        try:
            col_idx = meta.schema.to_arrow_schema().get_field_index(key)
        except Exception:
            return False
        if col_idx < 0:
            return False
        for rg in range(meta.num_row_groups):
            col = meta.row_group(rg).column(col_idx)
            stats = col.statistics
            if stats is None or not stats.has_min_max:
                return False
            if prev_max is not None and stats.min < prev_max:
                return False
            prev_max = stats.max
    return True
