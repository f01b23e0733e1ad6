"""BM25 full-text ranking over the ``documents`` table.

The retrieval primitive of a training-data curation stack (scoring
corpus docs against benchmark/eval queries, targeted selection, search
QA).  Okapi BM25 with the Lucene-style ``(k1+1)`` numerator and the
``ln(1 + (N - df + 0.5)/(df + 0.5))`` non-negative IDF.

Scale shape (one corpus scan, tiny everything-after):
  1. ONE streaming pass over ``documents`` emits, per batch, a single
     corpus-stats partial (doc count + token sum — 24 B) plus one row
     per (doc, query-term) hit: (doc_id, term, tf, dl).  Only docs
     matching ≥1 query term leave the scan; tf/dl counting is pandas
     vectorized-regex with patterns compiled once per actor.
  2. The matched-row set is materialized (its size is bounded by
     matching docs × |terms|, not the corpus); document frequencies
     fall out of a ``groupby(term).count()`` over it (|terms| rows).
  3. Scoring is arithmetic on the matched rows with the broadcast
     (idf, avgdl) table, summed per doc by one small-row shuffle;
     the global top-n is per-batch local-k partials → sort → limit
     (the ann_topk discipline), so the driver holds n rows.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from dude_ray.pipelines.textops import TOKEN_RE

# the benchmark query: terms from the synthetic corpus vocabulary with
# spread document frequencies
QUERY_TERMS = ("spark", "window", "merge", "vector")
BM25_K1 = 1.2
BM25_B = 0.75
TOP_N = 20


class _Bm25Scan:
    """documents → per-batch stats partial (kind 0) + per-(doc, term)
    tf rows (kind 1), unified schema so one pass serves both."""

    def __init__(self, terms):
        self.terms = list(terms)
        # term-as-token occurrences == term bounded by non-token chars;
        # Python re lookarounds (pandas str.count) — terms are pure
        # [a-z0-9_]+ so this equals token-equality counting, which is
        # what the DuckDB oracle's list_filter does
        self.pats = [re.compile(
            rf"(?<![a-z0-9_]){re.escape(t)}(?![a-z0-9_])")
            for t in self.terms]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        dl = text.str.count(TOKEN_RE).to_numpy(dtype=np.int64)
        lt = text.str.lower()
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        out_id, out_t, out_tf, out_dl = [], [], [], []
        for term, pat in zip(self.terms, self.pats):
            tf = lt.str.count(pat).to_numpy(dtype=np.int64)
            hit = np.nonzero(tf)[0]
            out_id.append(ids[hit])
            out_t.extend([term] * len(hit))
            out_tf.append(tf[hit])
            out_dl.append(dl[hit])
        n_hit = sum(len(a) for a in out_id)
        return pd.DataFrame({
            "kind": np.concatenate(([0], np.ones(n_hit, dtype=np.int64))),
            "doc_id": np.concatenate(([-1], *out_id)) if n_hit
            else np.array([-1], dtype=np.int64),
            "term": [""] + out_t,
            # stats partial reuses the tf/dl columns: tf=doc count,
            # dl=token sum for the batch
            "tf": np.concatenate(([len(df)], *out_tf)) if n_hit
            else np.array([len(df)], dtype=np.int64),
            "dl": np.concatenate(([int(dl.sum())], *out_dl)) if n_hit
            else np.array([int(dl.sum())], dtype=np.int64),
        })


def _kind(ds, k: int):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], k)),
        batch_format="pyarrow", batch_size=8192)


def run_bm25(sf_dir: str, terms=QUERY_TERMS, top_n: int = TOP_N,
             k1: float = BM25_K1, b: float = BM25_B,
             concurrency: int = 4, batch_size: int = 4096):
    """Top-``top_n`` documents by BM25 score for the fixed query.
    Output: (doc_id, score, rank) — rank on (round-6 score desc,
    doc_id asc), the same tie rule as the DuckDB oracle."""
    import pyarrow.compute as pc

    from dude_ray.io import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    scan = docs.map_batches(
        _Bm25Scan, fn_constructor_kwargs={"terms": terms},
        batch_format="pandas", batch_size=batch_size,
        concurrency=(1, concurrency)).materialize()

    stats = _kind(scan, 0).sum(["tf", "dl"])
    n_docs, total_tokens = stats["sum(tf)"], stats["sum(dl)"]
    avgdl = total_tokens / n_docs

    from dude_ray.partitioning import hash_grouped_reduce

    matched = _kind(scan, 1).materialize()
    n_matched = matched.count()

    def _df_counts(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("term", sort=False).size()
                .reset_index(name="df"))

    df_rows = hash_grouped_reduce(matched, "term", _df_counts,
                                  n_matched,
                                  out_cols=("term", "df")).take_all()
    idf = {r["term"]: math.log(1.0 + (n_docs - r["df"] + 0.5)
                               / (r["df"] + 0.5))
           for r in df_rows}

    def contrib(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.asarray([idf.get(t, 0.0)
                        for t in batch["term"].to_pylist()])
        score = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pa.table({"doc_id": batch["doc_id"],
                         "contrib": pa.array(score, type=pa.float64())})

    def _doc_sums(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("doc_id", sort=False)["contrib"].sum()
               .reset_index(name="sum(contrib)"))
        return out

    scores = hash_grouped_reduce(
        matched.map_batches(contrib, batch_format="pyarrow",
                            batch_size=8192),
        "doc_id", _doc_sums, n_matched,
        out_cols=("doc_id", "sum(contrib)"))

    def local_top(batch: pa.Table) -> pa.Table:
        s = pc.round(batch["sum(contrib)"], ndigits=6)
        t = pa.table({"doc_id": batch["doc_id"], "score": s})
        idx = pc.select_k_unstable(
            t, top_n, [("score", "descending"), ("doc_id", "ascending")])
        return t.take(idx)

    top = (scores.map_batches(local_top, batch_format="pyarrow",
                              batch_size=8192)
           .sort(["score", "doc_id"], descending=[True, False])
           .limit(top_n).to_pandas())
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top
