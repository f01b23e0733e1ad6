"""Weighted source interleave: permutation validity, local-reference
equality, and the proportional-prefix property that makes it a
training-mix schedule."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _local_reference(sf_dir: str, base: int = 6) -> pd.DataFrame:
    import pyarrow.parquet as pq

    from dude_ray.pipelines.sampling import _src_weight

    df = pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "source"]).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    df["rk"] = df.groupby("source").cumcount()
    df["key"] = df["rk"] * df["source"].map(
        lambda s: base // _src_weight(s))
    df = df.sort_values(["key", "source"]).reset_index(drop=True)
    df["mix_pos"] = np.arange(len(df), dtype=np.int64)
    return df.sort_values("doc_id").reset_index(drop=True)


def test_interleave_matches_reference(ray_session):
    from dude_ray.pipelines.sampling import run_mix_interleave

    got = (run_mix_interleave(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _local_reference(SF)
    cols = ["doc_id", "source", "rk", "key", "mix_pos"]
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=False)


def test_interleave_is_permutation(ray_session):
    from dude_ray.pipelines.sampling import run_mix_interleave

    got = run_mix_interleave(SF).to_pandas()
    pos = np.sort(got["mix_pos"].to_numpy())
    assert (pos == np.arange(len(got))).all()


def test_interleave_prefix_proportional(ray_session):
    """In any long-enough prefix of the mix order, each source appears
    roughly proportionally to its weight (until it runs dry)."""
    from dude_ray.pipelines.sampling import _src_weight, run_mix_interleave

    got = run_mix_interleave(SF).to_pandas()
    got["w"] = got["source"].map(_src_weight)
    prefix = got[got["mix_pos"] < 120]
    share = prefix.groupby("w").size()
    total_w = got.drop_duplicates("source").groupby("w")["source"].count()
    # expected draws per weight class ∝ class_weight × #sources in class
    expect = {w: 120 * (w * total_w[w])
              / sum(wi * total_w[wi] for wi in total_w.index)
              for w in total_w.index}
    for w in expect:
        assert abs(share.get(w, 0) - expect[w]) <= max(6, 0.2 * expect[w])
