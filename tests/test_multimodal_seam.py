"""Golden-bytes contract for the media decode seam (VERDICT_r04 #7).

``_fake_decode`` is the environment-forced stand-in for a real codec
(pillow/ffmpeg have no installable distribution in this container —
re-attempted and dated in stages/multimodal.py).  These goldens pin the
seam's EXACT input→output contract: a real codec drop-in replaces
``_fake_decode`` and these tests — and only these — flag every field
whose semantics changed, so the swap is verified by diff."""

import pyarrow as pa
import pytest

from dude_ray.sources.corpus import media_payload
from dude_ray.stages.multimodal import MediaDecoder, _fake_decode

GOLDEN_IN = b"golden-png-bytes"
GOLDEN_OUT = {
    "width": 744,
    "height": 1224,
    "n_frames": 2,
    "feature": [0.6549019607843137, 0.0784313725490196, 0.9294117647058824,
                0.30980392156862746, 0.23137254901960785,
                0.00784313725490196, 0.5686274509803921, 0.3058823529411765],
}


def test_fake_decode_golden_bytes():
    assert _fake_decode(GOLDEN_IN) == GOLDEN_OUT


def test_fake_decode_corpus_payload_golden():
    """The synthetic corpus payload path, end to end: media_payload is
    deterministic per ref, and the decode of that payload is stable."""
    p = media_payload("/img/1.png")
    assert len(p) == 1944
    assert p[:4] == b"\xd3\xcdwg"
    meta = _fake_decode(p)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (256, 1712, 4)


def test_fake_decode_contract_shape():
    """Structural contract every drop-in codec must keep: int dims > 0,
    n_frames >= 1, feature is a fixed-width list of floats in [0, 1]."""
    meta = _fake_decode(b"\x00\x01\x02")
    assert set(meta) == {"width", "height", "n_frames", "feature"}
    assert meta["width"] > 0 and meta["height"] > 0 and meta["n_frames"] >= 1
    assert len(meta["feature"]) == 8
    assert all(0.0 <= f <= 1.0 for f in meta["feature"])


def test_fake_decode_raises_on_empty():
    """Truncated-file analog: empty payload must raise, and the
    MediaDecoder batch stage must convert that into a decode_error row
    with zeroed fields — the error-row layout downstream relies on."""
    with pytest.raises(ValueError):
        _fake_decode(b"")
    batch = pa.table({
        "media_ref": pa.array(["/img/ok.png", "/img/bad.png"]),
        "payload": pa.array([GOLDEN_IN, b""], type=pa.binary()),
        "media_type": pa.array(["image/png", "image/png"]),
    })
    out = MediaDecoder()(batch)
    by_status = {r["decode_status"]: r for r in out.to_pylist()}
    err = by_status["decode_error"]
    good = by_status["ok"]
    assert err["width"] == 0 and err["height"] == 0 and err["n_frames"] == 0
    assert err["feature"] == []
    assert good["width"] == GOLDEN_OUT["width"]
    assert good["feature"] == GOLDEN_OUT["feature"]


def test_media_size_stats_local_oracle(ray_session):
    """The payload-size histogram of the REAL materialized media bytes
    equals the DuckDB recompute over the generator-contract sizes at
    sf0.001 — the binary column the decode stages consume is sized
    exactly as media_payload specifies."""
    import duckdb
    import pandas as pd

    from dude_ray.stages.multimodal import (run_media_size_stats,
                                            media_size_stats_oracle_sql)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    want = (con.execute(media_size_stats_oracle_sql(sf)).df()
            .reset_index(drop=True))
    assert (want["n_bytes"] >= 256).all()
    assert (want["n_bytes"] <= 256 + 255 * 8).all()

    got = run_media_size_stats(sf).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
