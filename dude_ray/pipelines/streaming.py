"""Streaming-window operator: tumbling windows with WATERMARK semantics
over a keyed event stream (the "streaming window" operator class the
reference lacks entirely — its only streaming control flow is the
pagination loop, /root/reference/dude/playwright_scraper.py:190-199).

Semantics (standard dataflow-model): events arrive per key in
``event_id`` order (the synthetic arrival order); the key's watermark
is the max event-time seen so far; a window [w, w+W) is FINAL once the
watermark reaches ``w + W + allowed_lateness`` — an event for a final
window is dropped, anything else is aggregated.  With
``allowed_lateness → ∞`` the output equals the batch tumbling-window
aggregate (run_events_window).

Scale shape: ONE hash partition by key (the unavoidable shuffle — a
key's stream must be observed in order), then a single vectorized scan
per key group (running-max watermark via ``np.maximum.accumulate``,
drop mask, groupby-window reduceat).  At 10^12-event scale keys shard
further by (key, time-range) with window stitching at range
boundaries, same as sessionization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

WINDOW_S = 300
LATENESS_S = 600


def run_streaming_window(sf_dir: str, window_s: int = WINDOW_S,
                         lateness_s: int = LATENESS_S):
    """Finalized tumbling windows per event_type under watermark +
    allowed-lateness dropping; one row per (event_type, window) over
    the KEPT events (windows still open at stream end flush on close,
    so totals equal the SQL oracle's kept-event aggregate)."""
    from dude_ray.io import read_parquet_clean

    w_us = window_s * 1_000_000
    late_us = lateness_s * 1_000_000

    def _arrival(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "event_id": batch["event_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "value": batch["value"],
        })

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy(dtype=np.int64)
        order = np.argsort(eid)  # arrival order within the key
        ts = g["ts_us"].to_numpy(dtype=np.int64)[order]
        val = g["value"].to_numpy(dtype=np.float64)[order]
        # watermark BEFORE each arrival: running max of strictly
        # preceding event times
        wm_prev = np.empty(len(ts), dtype=np.int64)
        if len(ts):
            wm_prev[0] = np.iinfo(np.int64).min
            if len(ts) > 1:
                wm_prev[1:] = np.maximum.accumulate(ts)[:-1]
        win = ts // w_us * w_us
        keep = wm_prev < win + w_us + late_us
        win, val = win[keep], val[keep]
        if not len(win):
            return pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "window_start_us": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "sum_value": pd.Series([], dtype="float64"),
            })
        sorter = np.argsort(win, kind="stable")
        win, val = win[sorter], val[sorter]
        starts = np.flatnonzero(np.r_[True, win[1:] != win[:-1]])
        n = np.diff(np.r_[starts, len(win)])
        sums = np.add.reduceat(val, starts)
        return pd.DataFrame({
            "event_type": pd.Series([g["event_type"].iloc[0]] * len(starts),
                                    dtype="object"),
            "window_start_us": pd.Series(win[starts], dtype="int64"),
            "n_events": pd.Series(n, dtype="int64"),
            "sum_value": pd.Series(np.round(sums, 4), dtype="float64"),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "event_id", "ts", "value"])
    keyed = ds.map_batches(_arrival, batch_format="pyarrow", batch_size=16384)
    return keyed.groupby("event_type").map_groups(_scan, batch_format="pandas")
