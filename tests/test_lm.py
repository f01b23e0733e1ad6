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
