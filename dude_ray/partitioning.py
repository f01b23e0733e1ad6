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

import numpy as np


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


def blocks_prove_order(partials) -> bool:
    """Runtime completion of :func:`parquet_sorted_by`'s metadata
    check: given per-block partial rows carrying ``first_id``,
    ``last_id`` and ``mono`` (block-internal monotonicity — the part
    row-group statistics can NEVER prove), verify blocks are
    internally sorted and their [first, last] ranges are disjoint and
    ascending.  Together the two checks are a full proof of global
    order, independent of executor bundle order or operator fusion."""
    seen: dict[int, tuple[int, bool]] = {}
    for p in partials:
        f = p["first_id"]
        if f in seen:
            continue
        seen[f] = (p["last_id"], bool(p["mono"]))
    prev_last = None
    for f in sorted(seen):
        last, mono = seen[f]
        if not mono or last < f:
            return False
        if prev_last is not None and f <= prev_last:
            return False
        prev_last = last
    return True


def resolve_ordered(ds, parquet_path: str, key: str, partial_fn,
                    batch_format: str = "pyarrow"):
    """(ordered dataset, validated block partials) for operators that
    need key-ordered contiguous blocks (two-pass prefix scans).

    Tries the sort-free path first — ONLY when parquet row-group stats
    are consistent with global order — then PROVES the order from the
    partials themselves (``blocks_prove_order``); any violation
    (intra-row-group disorder, executor reordering, non-fused stages)
    falls back to an explicit ``Dataset.sort``.  ``partial_fn`` must
    emit, per block, row(s) that include ``first_id`` / ``last_id`` /
    ``mono`` for the block."""
    attempts = []
    if parquet_sorted_by(parquet_path, key):
        attempts.append(ds.materialize())
    attempts.append(None)  # sentinel: explicit sort
    for cand in attempts:
        if cand is None:
            cand = ds.sort(key).materialize()
        parts = cand.map_batches(partial_fn, batch_format=batch_format,
                                 batch_size=None).take_all()
        parts.sort(key=lambda r: r["first_id"])
        if blocks_prove_order(parts):
            return cand, parts
    raise AssertionError(
        f"dataset not {key}-ordered even after an explicit sort")


def hash_grouped_reduce(ds, key_cols, reduce_fn, n_rows: int,
                        target_rows_per_group: int = 65536,
                        out_cols=None):
    """Vectorized substitute for ``Dataset.groupby().aggregate()``.

    Ray's sort-based aggregate runs its combine in Python per row
    (~20k rows/s measured on this Ray version — see
    dedup.run_substring_dup history for a 271 s → 1 s case), so every
    unbounded-key reduce here goes through this shape instead: a
    DETERMINISTIC fixed-key hash (pd.util.hash_array — python's
    builtin hash() is process-salted and would split keys across
    groups) of the key column(s), masked to a data-scaled group count
    (`scaled_group_count`, never a fixed width), ONE sort shuffle on
    that int key, then ``reduce_fn`` (a pandas frame → frame that
    groups by the real keys) vectorized per group.

    ``n_rows`` sizes the group count — pass a metadata-derived or
    already-known count, not an extra counting pass.  ``out_cols``
    optionally projects + converts the result back to Arrow blocks so
    downstream unions stay homogeneous."""
    import pandas as pd
    import pyarrow as pa

    n_groups = scaled_group_count(max(n_rows, 1), target_rows_per_group)
    mask = np.uint64(n_groups - 1)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def add_g(t: pa.Table) -> pa.Table:
        h = np.zeros(len(t), dtype=np.uint64)
        for c in keys:
            col = t[c].to_numpy(zero_copy_only=False)
            if col.dtype == object or col.dtype.kind in ("U", "S"):
                h ^= pd.util.hash_array(np.asarray(col, dtype=object))
            else:
                h ^= pd.util.hash_array(col.astype(np.int64))
            h = _mix(h)
        return t.append_column("__g", pa.array(
            (h & mask).astype(np.int64), type=pa.int64()))

    def reduce_g(df: pd.DataFrame) -> pd.DataFrame:
        return reduce_fn(df.drop(columns="__g"))

    out = (ds.map_batches(add_g, batch_format="pyarrow",
                          batch_size=65536)
           .groupby("__g")
           .map_groups(reduce_g, batch_format="pandas"))
    if out_cols is not None:
        out = out.map_batches(lambda t: t.select(list(out_cols)),
                              batch_format="pyarrow")
    return out


def _mix(x: np.ndarray) -> np.ndarray:
    x = x ^ (x >> np.uint64(33))
    x = x * np.uint64(0xFF51AFD7ED558CCD)
    return x ^ (x >> np.uint64(33))
