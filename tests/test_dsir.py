"""DSIR importance resampling vs a single-process numpy reference
(same hashing, same nano-quantized log-ratios)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _reference(sf: str, n_buckets: int = 1024, alpha: float = 1.0):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text", "lang"])

    def buckets(text):
        toks = (text or "").lower().split()
        feats = toks + [toks[i] + " " + toks[i + 1]
                        for i in range(len(toks) - 1)]
        return [int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                               "big") % n_buckets for s in feats]

    docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist(),
                    t["lang"].to_pylist()))
    tc = np.zeros(n_buckets, dtype=np.int64)
    rc = np.zeros(n_buckets, dtype=np.int64)
    per_doc = {}
    for did, text, lang in docs:
        bs = buckets(text)
        if not bs:
            continue
        cnt = np.bincount(bs, minlength=n_buckets)
        per_doc[did] = cnt
        rc += cnt
        if lang == "en":
            tc += cnt
    T, R = int(tc.sum()), int(rc.sum())
    lr = (np.log((tc + alpha) / (T + alpha * n_buckets))
          - np.log((rc + alpha) / (R + alpha * n_buckets)))
    lri = np.round(lr * 1e9).astype(np.int64)
    rows = [(did, int(cnt.sum()), int(cnt @ lri) / 1e9)
            for did, cnt in per_doc.items()]
    return (pd.DataFrame(rows, columns=["doc_id", "n_feats", "weight"])
            .sort_values("doc_id").reset_index(drop=True))


def test_dsir_weights_match_reference(ray_session):
    from dude_ray.pipelines.dsir import run_dsir_weights

    got = (run_dsir_weights(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _reference(SF)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dsir_weights_batch_size_invariant(ray_session):
    """Partial bucket-count merge order and batch boundaries must not
    leak into the weights."""
    from dude_ray.pipelines.dsir import run_dsir_weights

    small = (run_dsir_weights(SF, batch_size=64).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    big = (run_dsir_weights(SF, batch_size=4096).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(small, big)


def test_dsir_target_slice_scores_higher(ray_session):
    """Sanity of the method itself: documents from the target domain
    (lang='en') must average a higher importance weight than the
    rest."""
    import pyarrow.parquet as pq

    from dude_ray.pipelines.dsir import run_dsir_weights

    w = run_dsir_weights(SF).to_pandas()
    langs = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "lang"]).to_pandas()
    m = w.merge(langs, on="doc_id")
    per_tok_en = (m[m.lang == "en"].weight / m[m.lang == "en"].n_feats)
    per_tok_other = (m[m.lang != "en"].weight / m[m.lang != "en"].n_feats)
    assert per_tok_en.mean() > per_tok_other.mean()


def test_dsir_select_is_topk_of_weights(ray_session):
    from dude_ray.pipelines.dsir import run_dsir_select, run_dsir_weights

    k = 40
    sel = run_dsir_select(SF, k=k)
    w = run_dsir_weights(SF).to_pandas()
    want = (w.sort_values(["weight", "doc_id"], ascending=[False, True])
             .head(k).reset_index(drop=True))
    assert (sel["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (sel["weight"].to_numpy() == want["weight"].to_numpy()).all()
    assert (sel["rank"].to_numpy() == np.arange(1, k + 1)).all()
