"""Deduplication operators over the ``documents`` table — exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Shuffle discipline (the point at 100 TB):

* exact: one groupby on the 16-byte content hash — rows entering the
  shuffle are (hash, doc_id) only, never the text;
* MinHash-LSH: shingle→minhash per batch (vectorized numpy), explode
  to (band, band_hash, doc_id) rows — the only all-to-all is a groupby
  over those tiny band rows; candidate pairs are verified with exact
  Jaccard afterwards;
* SimHash: 64-bit signatures, 4×16-bit band buckets, Hamming≤k verify;
* embedding near-dup: random-hyperplane LSH buckets then exact cosine
  verify inside each bucket.

Verification needs both documents' shingles: at test scale the text
column is broadcast once via ``ray.put`` and read in each verify task
(small-side broadcast, no shuffle); the 100 TB path replaces this with
a two-sided hash join of the pair list against the documents table on
doc_id — noted per stage.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

MERSENNE = (1 << 61) - 1      # shingle-id space (exact Jaccard)
MERSENNE31 = (1 << 31) - 1    # minhash permutation modulus — products of
                              # two 31-bit values fit in uint64, keeping the
                              # signature kernel pure-numpy vectorized
NUM_PERM = 128
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# --------------------------------------------------------------------------
# exact dedup (content hash groupby)
# --------------------------------------------------------------------------

def md5_batch(batch: pa.Table) -> pa.Table:
    hs = [hashlib.md5((t or "").encode()).hexdigest() for t in batch["text"].to_pylist()]
    return pa.table({"h": pa.array(hs, type=pa.string()), "doc_id": batch["doc_id"]})


def run_exact_dedup(sf_dir: str):
    """hash-partition + per-group first: keeper = min doc_id per md5."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        md5_batch, batch_format="pyarrow", batch_size=4096)
    return ds.groupby("h").aggregate(Min("doc_id", alias_name="keeper_id"),
                                     Count(alias_name="dup_count"))


# --------------------------------------------------------------------------
# shingling + MinHash
# --------------------------------------------------------------------------

def shingle_set(text: str, n: int = 3) -> set[int]:
    """Word n-gram shingles hashed to 61-bit ints."""
    toks = (text or "").lower().split()
    if len(toks) < n:
        joined = " ".join(toks)
        return {_h61(joined)} if joined else set()
    return {_h61(" ".join(toks[i:i + n])) for i in range(len(toks) - n + 1)}


def _h61(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big") % MERSENNE


def _perm_params(num_perm: int = NUM_PERM, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE31, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, MERSENNE31, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Per-batch minhash signatures + banded LSH keys (state — the
    permutation table — built once per actor)."""

    def __init__(self, num_perm: int = NUM_PERM, bands: int = BANDS, seed: int = 42):
        self.a, self.b = _perm_params(num_perm, seed)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands

    def signature(self, shingles: set[int]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, MERSENNE31, dtype=np.uint64)
        x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
        x %= np.uint64(MERSENNE31)
        # (a*x + b) mod p, p = 2^31-1: both operands < 2^31 so the
        # product fits in uint64 — fully vectorized (num_perm, n_shingles)
        sig = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(MERSENNE31)
        return sig.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Explode each doc to (band, band_hash, doc_id) rows."""
        out_band, out_hash, out_doc = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = self.signature(shingle_set(text))
            for band in range(self.bands):
                chunk = sig[band * self.rows:(band + 1) * self.rows]
                h = hashlib.sha1(chunk.tobytes()).hexdigest()[:16]
                out_band.append(band)
                out_hash.append(h)
                out_doc.append(doc_id)
        return pa.table({
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_hash, type=pa.string()),
            "doc_id": pa.array(out_doc, type=pa.int64()),
        })


def _band_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs for one whole band: pandas-vectorized bucket
    scan.  Grouping at band granularity (16 groups) instead of bucket
    granularity (~1/doc) sidesteps Ray Data's per-group dispatch cost;
    at 10^10-doc scale the groupby key becomes (band, hash-prefix) to
    bound group size — same shape, finer split."""
    out_a: list[int] = []
    out_b: list[int] = []
    for _, bucket in g.groupby("band_hash", sort=False):
        ids = bucket["doc_id"].unique()
        if len(ids) < 2:
            continue
        ids = sorted(int(i) for i in ids)
        for x, y in itertools.combinations(ids, 2):
            out_a.append(x)
            out_b.append(y)
    return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                         "b": pd.Series(out_b, dtype="int64")})


class JaccardVerifier:
    """Exact n-gram Jaccard for candidate pairs.  Texts come from a
    broadcast ``ray.put`` ref (test-scale small side; the 100 TB path is
    a doc_id hash join against documents instead)."""

    def __init__(self, texts):
        # plain dict, not an ObjectRef: Ray Data puts constructor args in
        # the object store itself (one copy, fetched once per actor);
        # a raw ObjectRef here gets dropped by the operator spec's ref
        # tracking and ray.get deadlocks
        self.texts = texts
        self._cache: dict[int, set[int]] = {}

    def _sh(self, doc_id: int) -> set[int]:
        s = self._cache.get(doc_id)
        if s is None:
            s = self._cache[doc_id] = shingle_set(self.texts.get(doc_id, ""))
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch["a"].to_pylist()
        b_ids = batch["b"].to_pylist()
        jac = []
        for a, b in zip(a_ids, b_ids):
            sa, sb = self._sh(a), self._sh(b)
            union = len(sa | sb)
            jac.append(round(len(sa & sb) / union, 6) if union else 0.0)
        return pa.table({"a": batch["a"], "b": batch["b"],
                         "jaccard": pa.array(jac, type=pa.float64())})


def candidate_pairs_minhash(sf_dir: str, concurrency: int = 4):
    """documents → banded minhash rows → bucket groupby → unique pairs."""
    from ray.data.aggregate import Count

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHasher, batch_format="pyarrow", batch_size=2048,
        concurrency=(1, concurrency))
    pairs = ds.groupby("band").map_groups(_band_pairs, batch_format="pandas")
    # a pair found in several bands must dedup before (expensive) verify;
    # native Count aggregate (no per-group python) then project the key
    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="_n")).select_columns(["a", "b"])


def run_minhash_dedup(sf_dir: str, threshold: float = 0.8, concurrency: int = 4):
    """Verified near-duplicate pairs (jaccard >= threshold)."""
    import ray
    import ray.data as rd

    pairs = candidate_pairs_minhash(sf_dir, concurrency)
    df = _docs(sf_dir, ["doc_id", "text"]).to_pandas()
    texts = dict(zip(df["doc_id"], df["text"]))
    verified = pairs.map_batches(
        JaccardVerifier, fn_constructor_kwargs={"texts": texts},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, concurrency))
    import pyarrow.compute as pc

    return verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], threshold)),
        batch_format="pyarrow")


def run_ngram_jaccard(sf_dir: str, concurrency: int = 4):
    """Exact n-gram Jaccard for every LSH candidate pair (the verify
    stage exposed as its own operator)."""
    import ray

    pairs = candidate_pairs_minhash(sf_dir, concurrency)
    df = _docs(sf_dir, ["doc_id", "text"]).to_pandas()
    texts = dict(zip(df["doc_id"], df["text"]))
    return pairs.map_batches(
        JaccardVerifier, fn_constructor_kwargs={"texts": texts},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, concurrency))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash per doc + 4×16-bit band keys."""

    def __init__(self):
        pass

    @staticmethod
    def simhash(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for tok in (text or "").lower().split():
            h = int.from_bytes(hashlib.sha1(tok.encode()).digest()[:8], "big")
            bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
            acc += 2 * bits - 1
        return int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_doc, out_band, out_key, out_sig = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = self.simhash(text)
            for band in range(4):
                out_doc.append(doc_id)
                out_band.append(band)
                out_key.append((sig >> (band * 16)) & 0xFFFF)
                out_sig.append(sig)
        return pa.table({
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "band": pa.array(out_band, type=pa.int32()),
            "key": pa.array(out_key, type=pa.int64()),
            "sig": pa.array(out_sig, type=pa.uint64()),
        })


def _simhash_bucket_pairs(g: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    rows = g.drop_duplicates("doc_id").sort_values("doc_id")
    ids = rows["doc_id"].to_numpy()
    sigs = rows["sig"].to_numpy(dtype=np.uint64)
    out_a, out_b, out_d = [], [], []
    for i in range(len(ids)):
        x = sigs[i:i + 1] ^ sigs[i + 1:]
        d = np.array([bin(int(v)).count("1") for v in x])
        for j in np.nonzero(d <= max_hamming)[0]:
            out_a.append(int(ids[i]))
            out_b.append(int(ids[i + 1 + j]))
            out_d.append(int(d[j]))
    return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                         "b": pd.Series(out_b, dtype="int64"),
                         "hamming": pd.Series(out_d, dtype="int64")})


def run_simhash_dedup(sf_dir: str, max_hamming: int = 3, concurrency: int = 4):
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pyarrow", batch_size=2048,
        concurrency=(1, concurrency))
    from ray.data.aggregate import Count, Min

    def _band_simhash_pairs(g: pd.DataFrame) -> pd.DataFrame:
        frames = [_simhash_bucket_pairs(b, max_hamming)
                  for _, b in g.groupby("key", sort=False)]
        frames = [f for f in frames if len(f)]
        if not frames:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    pairs = ds.groupby("band").map_groups(_band_simhash_pairs,
                                          batch_format="pandas")
    return pairs.groupby(["a", "b"]).aggregate(
        Min("hamming", alias_name="hamming"))


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------

class HyperplaneLSH:
    """Random-hyperplane signatures over the embedding column.  Fewer
    bits → larger buckets → higher recall at lower similarity (the
    operator's recall/cost knob)."""

    def __init__(self, dim: int, n_bits: int = 16, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_bits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        bits = (emb @ self.planes) > 0
        keys = bits.dot(1 << np.arange(bits.shape[1], dtype=np.int64))
        return pa.table({
            "vec_id": batch["vec_id"],
            "key": pa.array(keys, type=pa.int64()),
        })


def run_embedding_neardup(sf_dir: str, threshold: float = 0.95,
                          n_bits: int = 16, concurrency: int = 4):
    """Cosine near-dup pairs: hyperplane-LSH bucket → exact cosine verify
    inside the bucket (embeddings broadcast at test scale)."""
    import ray
    import ray.data as rd

    t = pa.Table.from_pandas(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas())
    ids = np.asarray(t["vec_id"].to_pylist())
    emb = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    dim = emb.shape[1]

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    keyed = ds.map_batches(HyperplaneLSH,
                           fn_constructor_kwargs={"dim": dim, "n_bits": n_bits},
                           batch_format="pyarrow", batch_size=4096,
                           concurrency=(1, concurrency))

    all_ids, all_emb = ids, emb  # captured by value in the groupby UDF
    pos = {int(v): i for i, v in enumerate(all_ids)}

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        vids = sorted(int(v) for v in g["vec_id"].unique())
        out_a, out_b, out_s = [], [], []
        if len(vids) >= 2:
            sub = all_emb[[pos[v] for v in vids]]
            sims = sub @ sub.T
            for i in range(len(vids)):
                for j in range(i + 1, len(vids)):
                    s = float(sims[i, j])
                    if s >= threshold:
                        out_a.append(vids[i])
                        out_b.append(vids[j])
                        out_s.append(round(s, 6))
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64"),
                             "cosine": pd.Series(out_s, dtype="float64")})

    from ray.data.aggregate import Min

    def _coarse(batch):
        import pyarrow.compute as _pc

        return batch.append_column(
            "kgroup", _pc.cast(_pc.bit_wise_and(batch["key"], 31), pa.int64()))

    def _group_verify(g: pd.DataFrame) -> pd.DataFrame:
        frames = [bucket_verify(b) for _, b in g.groupby("key", sort=False)]
        frames = [f for f in frames if len(f)]
        if not frames:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    pairs = keyed.map_batches(_coarse, batch_format="pyarrow").groupby(
        "kgroup").map_groups(_group_verify, batch_format="pandas")
    out = pairs.groupby(["a", "b"]).aggregate(
        Min("cosine", alias_name="cosine"))
    # pin the schema even when no pair clears the threshold (an empty
    # aggregate otherwise yields a schemaless dataset)
    empty = rd.from_arrow(pa.table({
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64()),
        "cosine": pa.array([], type=pa.float64()),
    }))
    return empty.union(out)


def run_ngram_jaccard_pairs(sf_dir: str, limit: int = 100):
    """Exact word-3-gram Jaccard for the deterministic consecutive-id
    pair set (doc i vs doc i+1, i < limit) — the SQL-checkable variant
    of the verify kernel (semantics mirror the DuckDB oracle: grams
    from a single-space split, lowercased, empty set below 3 words)."""
    import ray.data as rd

    df = _docs(sf_dir, ["doc_id", "text"]).to_pandas()
    texts = dict(zip(df["doc_id"], df["text"]))
    max_id = max(texts)
    pairs = [(i, i + 1) for i in range(min(limit, max_id))]

    def grams(t: str) -> set[str]:
        w = [x.lower() for x in (t or "").split(" ")]
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    rows = []
    for a, b in pairs:
        ga, gb = grams(texts.get(a, "")), grams(texts.get(b, ""))
        union = len(ga | gb)
        rows.append({"a": a, "b": b,
                     "jaccard": round(len(ga & gb) / union, 6) if union else 0.0})
    import pandas as _pd

    # tiny fixed-size result; from_pandas keeps it a Dataset for the
    # driver contract (computation is the broadcast-kernel itself)
    return rd.from_pandas(_pd.DataFrame(rows))
