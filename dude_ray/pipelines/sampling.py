"""Data-mixing operators: deterministic stratified sampling and
token-budget sequence packing.

Both are the "assemble the training mix" stage that follows cleaning
and dedup in an LLM data pipeline.  Sampling is a stateless streaming
filter keyed on a content-independent deterministic hash (rerunnable,
resumable, and identical across cluster sizes — no RNG state to
coordinate).  Packing is a distributed prefix-sum scan: per-block
partials to the driver (one tiny row per block), offsets broadcast
back, per-block vectorized cumsum — the classic two-pass scan shape
that keeps 100 TB streaming while the driver only ever holds
block-count rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from dude_ray.pipelines.textops import TOKEN_RE


def _docs(sf_dir: str, columns):
    from dude_ray.io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


# --------------------------------------------------------------------------
# stratified sampling
# --------------------------------------------------------------------------

# per-language keep rates (the "data mix"); rates are exact multiples
# of 2^-20 comparisons against a 20-bit hash bucket, so Ray and the
# SQL oracle agree bit-for-bit with no float rounding at the boundary
DEFAULT_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25}
DEFAULT_RATE = 0.125
_HASH_BUCKETS = 1 << 20


def _keep_mask(doc_ids, langs, rates, default_rate) -> np.ndarray:
    """Deterministic per-doc uniform: md5 of the decimal doc_id string,
    top 8 hex chars, reduced mod 2^20.  md5 (a C primitive, ~0.5 µs/row,
    embarrassingly parallel) is used instead of a numpy avalanche
    because the DuckDB oracle must reproduce the exact stream."""
    u = np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
         for i in doc_ids),
        dtype=np.uint64, count=len(doc_ids)) % _HASH_BUCKETS
    thresh = np.fromiter(
        (rates.get(l, default_rate) for l in langs),
        dtype=np.float64, count=len(langs))
    return u / _HASH_BUCKETS < thresh


def run_sample_stratified(sf_dir: str, rates: dict | None = None,
                          default_rate: float = DEFAULT_RATE):
    """Per-language proportional sample of ``documents`` — the data-mix
    downsampler.  Stateless streaming filter; sampling decisions depend
    only on doc_id, so a resumed or re-sharded run keeps the identical
    sample and per-partition outputs can be retried independently."""
    rates = DEFAULT_RATES if rates is None else rates

    def sample(batch: pa.Table) -> pa.Table:
        keep = _keep_mask(batch["doc_id"].to_pylist(),
                          batch["lang"].to_pylist(), rates, default_rate)
        return batch.filter(pa.array(keep))

    return _docs(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        sample, batch_format="pyarrow", batch_size=8192)


# --------------------------------------------------------------------------
# token-budget sequence packing (distributed prefix-sum scan)
# --------------------------------------------------------------------------

PACK_BUDGET = 1024


def run_token_pack(sf_dir: str, budget: int = PACK_BUDGET):
    """Concat-then-chunk sequence packing: documents in doc_id order are
    laid head-to-tail into one virtual token stream and cut every
    ``budget`` tokens; each doc is assigned the pack (training sequence)
    its FIRST token lands in — the streaming loader semantics of
    GPT-style pretraining.

    Distributed scan shape:
      1. one streaming pass reduces text → (doc_id, n_tokens) rows
         (16 B/doc) and sorts them by doc_id (range-partitioned blocks);
      2. per-block partials (first doc_id, token sum) — ONE row per
         block — come to the driver, which prefix-sums them into a
         start-offset per block (driver state = #blocks rows, not data);
      3. a second per-block pass adds the broadcast block offset to the
         block-local exclusive cumsum.
    The corpus text is read once; everything after step 1 moves only
    fixed-width rows."""
    counted = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_tokens": pc.cast(
                pc.count_substring_regex(b["text"], TOKEN_RE), pa.int64()),
        }),
        batch_format="pyarrow", batch_size=4096)
    # sort-free when parquet row-group stats allow it, PROVEN at
    # runtime from the block partials (first/last/mono) — intra-row-
    # group disorder or executor reordering falls back to the sort
    from dude_ray.partitioning import resolve_ordered

    def block_partial(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return pa.table({"first_id": pa.array([], type=pa.int64()),
                             "last_id": pa.array([], type=pa.int64()),
                             "mono": pa.array([], type=pa.bool_()),
                             "total": pa.array([], type=pa.int64())})
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "first_id": pa.array([int(ids[0])], type=pa.int64()),
            "last_id": pa.array([int(ids[-1])], type=pa.int64()),
            "mono": pa.array([bool(np.all(ids[:-1] < ids[1:]))]),
            "total": pa.array([pc.sum(batch["n_tokens"]).as_py() or 0],
                              type=pa.int64()),
        })

    ordered, partials = resolve_ordered(
        counted, f"{sf_dir}/documents.parquet", "doc_id", block_partial)
    offsets: dict[int, int] = {}
    acc = 0
    for p in partials:
        offsets[p["first_id"]] = acc
        acc += p["total"]

    def assign(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64()),
                             "start_offset": pa.array([], type=pa.int64()),
                             "pack_id": pa.array([], type=pa.int64())})
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        start = offsets[batch["doc_id"][0].as_py()]
        off = start + np.concatenate(([0], np.cumsum(n[:-1])))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": batch["n_tokens"],
            "start_offset": pa.array(off, type=pa.int64()),
            "pack_id": pa.array(off // budget, type=pa.int64()),
        })

    return ordered.map_batches(assign, batch_format="pyarrow",
                               batch_size=None)


# --------------------------------------------------------------------------
# exactly-k per-group sampling (consistent hash ranking)
# --------------------------------------------------------------------------

SAMPLE_K = 20


def _hash_rank(doc_ids) -> np.ndarray:
    """The md5-prefix rank stream shared with the SQL oracle."""
    return np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
         for i in doc_ids),
        dtype=np.int64, count=len(doc_ids))


def run_sample_per_group(sf_dir: str, k: int = SAMPLE_K):
    """Exactly-k-per-language sample: the k docs with the smallest
    md5(doc_id) rank per stratum — a deterministic reservoir.  Because
    ranks are content-independent and global, growing the corpus only
    displaces samples, never reshuffles them, and any two runs (or a
    resumed run) agree exactly.

    Scale shape: per-batch local k-smallest per language (pandas sort +
    groupby head), so at most k × #languages rows leave each batch;
    one tiny groupby finishes the selection."""

    def local_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(h=_hash_rank(df["doc_id"]))
        return (df.sort_values(["h", "doc_id"])
                .groupby("lang", sort=False).head(k))

    def final_k(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"]).head(k).reset_index(drop=True)
        return pd.DataFrame({
            "lang": g["lang"],
            "doc_id": g["doc_id"].astype("int64"),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    partials = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        local_k, batch_format="pandas", batch_size=8192)
    return partials.groupby("lang").map_groups(final_k,
                                               batch_format="pandas")


# --------------------------------------------------------------------------
# weighted source interleave (shuffle-free analytic rank)
# --------------------------------------------------------------------------

INTERLEAVE_BASE = 6  # lcm of the weight set {1, 2, 3}


def _src_weight(source: str) -> int:
    """Deterministic per-source mix weight derived from the source id
    (srcN → (N % 3) + 1) — a stand-in for a configured mix table."""
    return (int(source[3:]) % 3) + 1


def run_mix_interleave(sf_dir: str, base: int = INTERLEAVE_BASE):
    """Weighted round-robin interleave of sources into one global
    training order: source s with weight w contributes its rk-th doc at
    key = rk * (base // w), and mix_pos is the global rank of
    (key, source) — i.e. heavier sources appear proportionally more
    often in any prefix of the stream (the sampling schedule of a
    multi-source training mix).

    Scale design — NO global sort or shuffle computes the rank:
      1. the input's doc_id order is taken from parquet row-group
         stats when provable (metadata-only check), with an explicit
         sort fallback otherwise;
      2. per-source prefix ranks rk via the token_pack two-pass block
         scan (per-block (source, count) partials → driver prefix-sum
         → broadcast offsets → block-local cumcount); per-source
         TOTALS fall out of the same partials — no separate groupby;
      3. mix_pos is computed ANALYTICALLY per row from the broadcast
         totals: #rows before (key, source) =
         Σ_s' min(n_s', ceil(key / stride_s')) + #{s' < s tied at key}
         — pure vectorized integer arithmetic, |S| passes per batch.
    The equivalent SQL is two window functions over a global sort; here
    every stage is streaming and the only coordination is one
    #blocks×#sources-row driver round-trip."""
    from dude_ray.partitioning import resolve_ordered

    def block_partial(batch: pa.Table) -> pa.Table:
        # Arrow-native (r5 sweep): C++ group_by count, zero-copy ids
        if not batch.num_rows:
            return pa.table({"first_id": pa.array([], type=pa.int64()),
                             "last_id": pa.array([], type=pa.int64()),
                             "mono": pa.array([], type=pa.bool_()),
                             "source": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        g = (batch.group_by("source")
             .aggregate([("source", "count")]).sort_by("source"))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        k = g.num_rows
        return pa.table({
            "first_id": pa.array([int(ids[0])] * k, type=pa.int64()),
            "last_id": pa.array([int(ids[-1])] * k, type=pa.int64()),
            "mono": pa.array([bool(np.all(ids[:-1] < ids[1:]))] * k),
            "source": g["source"],
            "cnt": pc.cast(g["source_count"], pa.int64()),
        })

    docs, partials = resolve_ordered(
        _docs(sf_dir, ["doc_id", "source"]),
        f"{sf_dir}/documents.parquet", "doc_id", block_partial,
        batch_format="pyarrow")
    totals: dict[str, int] = {}
    for p in partials:
        totals[p["source"]] = totals.get(p["source"], 0) + p["cnt"]
    sources = sorted(totals)
    stride = {s: base // _src_weight(s) for s in sources}
    offsets: dict[tuple[int, str], int] = {}
    acc = {s: 0 for s in sources}
    for p in partials:
        offsets[(p["first_id"], p["source"])] = acc[p["source"]]
        acc[p["source"]] += p["cnt"]

    n_arr = np.array([totals[s] for s in sources], dtype=np.int64)
    st_arr = np.array([stride[s] for s in sources], dtype=np.int64)

    src_domain = pa.array(sources, type=pa.string())

    def assign(batch: pa.Table) -> pa.Table:
        """Arrow-native (r5 sweep): the old pandas version paid three
        per-row Python ``Series.map`` calls per batch; source values now
        dictionary-encode ONCE via ``pc.index_in`` (lex code == domain
        index, the domain being the sorted source list) and every
        lookup is a small-array gather."""
        n = batch.num_rows
        if not n:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "source": pa.array([], type=pa.string()),
                             "rk": pa.array([], type=pa.int64()),
                             "key": pa.array([], type=pa.int64()),
                             "mix_pos": pa.array([], type=pa.int64())})
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        first = int(ids[0])
        codes = pc.index_in(batch["source"],
                            value_set=src_domain).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # block-local per-source cumcount: stable sort by code, then
        # position-minus-segment-start, scattered back
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        seg_start = np.repeat(starts, np.diff(np.r_[starts, n]))
        local = np.empty(n, dtype=np.int64)
        local[order] = np.arange(n, dtype=np.int64) - seg_start
        off_by_code = np.array(
            [offsets.get((first, s), 0) for s in sources], dtype=np.int64)
        rk = off_by_code[codes] + local
        key = rk * st_arr[codes]
        pos = np.zeros(n, dtype=np.int64)
        for i in range(len(sources)):
            st, cnt = st_arr[i], n_arr[i]
            pos += np.minimum(cnt, (key + st - 1) // st)
            pos += ((i < codes) & (key % st == 0)
                    & (key // st < cnt)).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "rk": pa.array(rk, type=pa.int64()),
            "key": pa.array(key, type=pa.int64()),
            "mix_pos": pa.array(pos, type=pa.int64()),
        })

    return docs.map_batches(assign, batch_format="pyarrow",
                            batch_size=None)


# --------------------------------------------------------------------------
# sliding-window token chunking (context-window preparation)
# --------------------------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def run_text_chunk(sf_dir: str, window: int = CHUNK_TOKENS,
                   stride: int = CHUNK_STRIDE):
    """Sliding-window token chunking of ``documents`` — the
    context-window preparation step of an LLM pipeline (RAG indexing /
    fixed-length pretraining examples with overlap).  Each doc's
    TOKEN_RE tokens are cut into windows of ``window`` tokens starting
    every ``stride`` tokens (overlap = window - stride); a doc emits
    ceil(n/stride) chunks, so the stage is a pure flat-map: stateless,
    shuffle-free, and each output chunk names its (doc_id, chunk_id)
    so downstream dedup/embedding stages can cite provenance.

    Scale shape: per-batch fan-out only — no shuffle, no driver state;
    output size is bounded by window/stride × corpus tokens, and the
    whole stage streams block-by-block.  Tokenization is one compiled
    C regex per doc and each chunk is one str.join — no per-token
    Python."""
    import re

    pat = re.compile(TOKEN_RE)

    def chunk(batch: pa.Table) -> pa.Table:
        ids_out, cids, starts, ntoks, texts = [], [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            toks = pat.findall(text or "")
            n = len(toks)
            for ci, s in enumerate(range(0, n, stride)):
                w = toks[s:s + window]
                ids_out.append(did)
                cids.append(ci)
                starts.append(s)
                ntoks.append(len(w))
                texts.append(" ".join(w))
        return pa.table({
            "doc_id": pa.array(ids_out, type=pa.int64()),
            "chunk_id": pa.array(cids, type=pa.int64()),
            "start_tok": pa.array(starts, type=pa.int64()),
            "chunk_tokens": pa.array(ntoks, type=pa.int64()),
            "chunk_text": pa.array(texts, type=pa.string()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunk, batch_format="pyarrow", batch_size=2048)


# --------------------------------------------------------------------------
# deterministic training-shard assignment
# --------------------------------------------------------------------------

N_SHARDS = 64


def run_shard_assign(sf_dir: str, n_shards: int = N_SHARDS):
    """Deterministic training-shard manifest: every doc is assigned to
    shard md5(doc_id) % n_shards (the same content-independent md5
    stream as sample_stratified, so the DuckDB oracle reproduces it
    bit-for-bit), and the output is ONE ROW PER SHARD — doc count,
    token sum, and the doc_id range — i.e. the shard manifest a
    training loader reads to plan epochs.

    Scale shape: the shard id is a stateless per-row hash; per-batch
    partials collapse each block to ≤n_shards rows before the tiny
    tree_combine merge, so the shuffle carries O(blocks × shards)
    fixed-width rows regardless of corpus size.  Assignment is
    resumable and cluster-size-independent by construction (pure
    function of doc_id)."""
    from dude_ray.pipelines.relational import tree_combine

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        shard = _hash_rank(ids) % n_shards
        ntok = pc.cast(pc.count_substring_regex(batch["text"], TOKEN_RE),
                       pa.int64())
        t = pa.table({
            "shard": pa.array(shard, type=pa.int64()),
            "n_docs": pa.array(np.ones(len(ids), dtype=np.int64)),
            "n_tokens": ntok,
            "min_doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "max_doc_id": pc.cast(batch["doc_id"], pa.int64()),
        })
        g = t.group_by(["shard"]).aggregate(
            [("n_docs", "sum"), ("n_tokens", "sum"),
             ("min_doc_id", "min"), ("max_doc_id", "max")])
        return pa.table({
            "shard": g["shard"], "n_docs": g["n_docs_sum"],
            "n_tokens": g["n_tokens_sum"],
            "min_doc_id": g["min_doc_id_min"],
            "max_doc_id": g["max_doc_id_max"],
        })

    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow", batch_size=8192)
    return tree_combine(partials, keys=("shard",),
                        sums=("n_docs", "n_tokens"),
                        mins=("min_doc_id",), maxs=("max_doc_id",))


# --------------------------------------------------------------------------
# weighted sampling without replacement (priority sampling)
# --------------------------------------------------------------------------

PRIORITY_K = 100


def run_priority_sample(sf_dir: str, k: int = PRIORITY_K):
    """Weighted sample of ``documents`` without replacement — priority
    sampling per Duffield, Lund & Thorup (JACM 2007): each doc gets
    priority w / u with u ~ Uniform(0,1] and the k highest priorities
    win; inclusion probability is ∝ weight (here n_chars — longer docs
    are likelier picks, the standard size-weighted corpus subsample).

    Determinism contract: u = (md5-bucket + 1) / 2^20 reuses the
    sample_stratified hash stream, and the priority is ONE IEEE double
    division — correctly rounded, hence bit-identical in numpy and
    DuckDB (no ln/pow whose libm rounding could differ).  Distributed
    shape: per-batch local top-k (≤k rows leave each batch), one tiny
    final combine — same two-level selection as sample_per_group."""

    def local_k(df: pd.DataFrame) -> pd.DataFrame:
        u = (_hash_rank(df["doc_id"]) % _HASH_BUCKETS + 1) / \
            float(_HASH_BUCKETS)
        pr = df["n_chars"].to_numpy(dtype=np.float64) / u
        out = df.assign(priority=pr)
        return out.sort_values(["priority", "doc_id"],
                               ascending=[False, True]).head(k)

    def final_k(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["priority", "doc_id"],
                             ascending=[False, True])
              .head(k).reset_index(drop=True))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "weight": df["n_chars"].astype("int64"),
            "rank": np.arange(1, len(df) + 1, dtype=np.int64),
        })

    partials = _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        local_k, batch_format="pandas", batch_size=8192)
    return partials.repartition(1).map_batches(
        final_k, batch_format="pandas", batch_size=None)


# --------------------------------------------------------------------------
# deterministic train/val/test split
# --------------------------------------------------------------------------

SPLIT_BUCKETS = 100
SPLIT_EDGES = (80, 90)  # [0,80) train, [80,90) val, [90,100) test


def run_dataset_split(sf_dir: str, batch_size: int = 65536):
    """Deterministic train/val/test assignment: bucket =
    splitmix64(doc_id) % 100 → train (<80) / val (<90) / test — the
    standard content-independent hash split that is rerunnable,
    resumable and identical across cluster sizes (no RNG state, no
    shuffle; adding documents never reassigns existing ones, unlike a
    row-number split).

    One column-pruned scan of doc_id only; integer-exact output, so
    the SQL oracle (the same splitmix64 chain via wraparound-emulated
    HUGEINT multiplies) hash-matches with no rounding contract."""
    from dude_ray.pipelines.sketches import _mix64

    names = np.array(["train", "val", "test"], dtype=object)

    def _batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        b = (_mix64(ids.astype(np.uint64))
             % np.uint64(SPLIT_BUCKETS)).astype(np.int64)
        s = np.searchsorted(np.asarray(SPLIT_EDGES), b, side="right")
        return pa.table({
            "doc_id": batch["doc_id"],
            "bucket": pa.array(b, type=pa.int64()),
            "split": pa.array(names[s], type=pa.string()),
        })

    return _docs(sf_dir, ["doc_id"]).map_batches(
        _batch, batch_format="pyarrow", batch_size=batch_size)


def dataset_split_oracle_sql() -> str:
    """DuckDB oracle for :func:`run_dataset_split` — the splitmix64
    finalizer recomputed step-by-step (wraparound multiplies via the
    32-bit-split schoolbook product, as in the HLL oracle)."""
    from dude_ray.pipelines.dedup import _sql_addmod64, _sql_mulmod64
    from dude_ray.pipelines.sketches import (_SPLITMIX_C1, _SPLITMIX_C2,
                                             _SPLITMIX_INC)

    lo, hi = SPLIT_EDGES
    return f"""
        WITH s1 AS (SELECT doc_id,
                    {_sql_addmod64('CAST(doc_id AS UBIGINT)',
                                   str(int(_SPLITMIX_INC)))} AS x
                    FROM documents),
        s2 AS (SELECT doc_id, xor(x, x >> 30) AS x FROM s1),
        s3 AS (SELECT doc_id,
               {_sql_mulmod64('x', int(_SPLITMIX_C1))} AS x FROM s2),
        s4 AS (SELECT doc_id, xor(x, x >> 27) AS x FROM s3),
        s5 AS (SELECT doc_id,
               {_sql_mulmod64('x', int(_SPLITMIX_C2))} AS x FROM s4),
        s6 AS (SELECT doc_id,
               CAST(xor(x, x >> 31) % {SPLIT_BUCKETS} AS BIGINT) AS bucket
               FROM s5)
        SELECT doc_id, bucket,
               CASE WHEN bucket < {lo} THEN 'train'
                    WHEN bucket < {hi} THEN 'val'
                    ELSE 'test' END AS split
        FROM s6
    """
