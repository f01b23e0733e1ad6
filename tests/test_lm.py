"""Bigram-LM scoring vs an independent Counter-based reference."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _reference(docs: pd.DataFrame):
    big, uni = Counter(), Counter()
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        pairs = list(zip(toks[:-1], toks[1:]))
        per_doc[did] = pairs
        big.update(pairs)
        uni.update(t[0] for t in pairs)
    out = {}
    for did, pairs in per_doc.items():
        if not pairs:
            continue
        lp = [math.log(big[p] / uni[p[0]]) for p in pairs]
        out[did] = (round(sum(lp) / len(lp), 6), len(pairs))
    return out


def test_tfidf_keywords_matches_reference(ray_session):
    """Per-doc TF-IDF top-k vs an independent Counter-based reference."""
    from dude_ray.pipelines.ranking import run_tfidf_keywords

    got = run_tfidf_keywords(SF, top_k=5).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "text"])
    n = len(docs)
    df_counter: Counter = Counter()
    tfs = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        tf = Counter(text.split(" "))
        tfs[did] = tf
        df_counter.update(tf.keys())
    assert set(got["doc_id"]) == set(docs["doc_id"])
    assert got.groupby("doc_id").size().max() <= 5
    for did in list(docs["doc_id"])[:25]:
        scored = sorted(
            ((round(tf * math.log(n / df_counter[t]), 6), t)
             for t, tf in tfs[did].items()),
            key=lambda x: (-x[0], x[1]))[:5]
        sub = (got[got["doc_id"] == did]
               .sort_values("rank").reset_index(drop=True))
        assert list(sub["term"]) == [t for _s, t in scored]
        assert np.allclose(sub["score"], [s for s, _t in scored],
                           atol=2e-6)


def test_lm_score_matches_reference(ray_session):
    from dude_ray.pipelines.lm import run_lm_score

    got = run_lm_score(SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "text"])
    ref = _reference(docs)
    assert len(got) == len(ref)
    assert (got["lm_score"] < 0).all()  # every bigram p < 1
    by_id = got.set_index("doc_id")
    for did, (score, nb) in ref.items():
        assert by_id.loc[did, "n_bigrams"] == nb
        assert np.isclose(by_id.loc[did, "lm_score"], score, atol=2e-6)
