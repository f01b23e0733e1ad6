"""Stratified-sampling and token-packing tests: determinism,
rate accuracy, prefix-sum correctness vs a local oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_sample_deterministic_and_ratewise(ray_session):
    from dude_ray.pipelines.sampling import (DEFAULT_RATE, DEFAULT_RATES,
                                             run_sample_stratified)

    ids1 = sorted(r["doc_id"] for r in run_sample_stratified(SF).take_all())
    ids2 = sorted(r["doc_id"] for r in run_sample_stratified(SF).take_all())
    assert ids1 == ids2, "sampling must be deterministic across runs"

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    by_lang_total: dict[str, int] = {}
    for lang in t["lang"].to_pylist():
        by_lang_total[lang] = by_lang_total.get(lang, 0) + 1
    kept = {r["doc_id"]: r["lang"]
            for r in run_sample_stratified(SF).take_all()}
    by_lang_kept: dict[str, int] = {}
    for lang in kept.values():
        by_lang_kept[lang] = by_lang_kept.get(lang, 0) + 1
    for lang, total in by_lang_total.items():
        rate = DEFAULT_RATES.get(lang, DEFAULT_RATE)
        got = by_lang_kept.get(lang, 0) / total
        # binomial tolerance at these tiny strata sizes
        sigma = (rate * (1 - rate) / total) ** 0.5
        assert abs(got - rate) < max(4 * sigma, 0.08), (lang, got, rate)


def test_sample_subsets_nest(ray_session):
    """Halving a rate keeps a subset of the higher-rate sample iff the
    threshold comparison uses the same hash stream — the property that
    makes remixing cheap (no re-scan of dropped docs)."""
    from dude_ray.pipelines.sampling import run_sample_stratified

    hi = {r["doc_id"] for r in run_sample_stratified(
        SF, rates={}, default_rate=0.5).take_all()}
    lo = {r["doc_id"] for r in run_sample_stratified(
        SF, rates={}, default_rate=0.25).take_all()}
    assert lo <= hi


def test_token_pack_prefix_sum(ray_session):
    from dude_ray.pipelines.sampling import run_token_pack
    from dude_ray.pipelines.textops import run_token_count

    budget = 512
    rows = sorted(run_token_pack(SF, budget=budget).take_all(),
                  key=lambda r: r["doc_id"])
    counts = {r["doc_id"]: r["n_tokens"]
              for r in run_token_count(SF).take_all()}
    off = 0
    for r in rows:
        assert r["n_tokens"] == counts[r["doc_id"]]
        assert r["start_offset"] == off
        assert r["pack_id"] == off // budget
        off += r["n_tokens"]
    # packs are contiguous, non-decreasing
    packs = [r["pack_id"] for r in rows]
    assert packs == sorted(packs)


def test_token_pack_block_boundary(ray_session, tmp_path):
    """Many small blocks → the scan must stitch offsets across blocks."""
    from dude_ray.pipelines.sampling import run_token_pack

    n = 200
    texts = [" ".join(["w"] * (i % 7 + 1)) for i in range(n)]
    t = pa.table({
        "doc_id": pa.array(list(range(n)), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["x"] * n),
        "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    import pyarrow.parquet as pqw
    pqw.write_table(t, str(d / "documents.parquet"), row_group_size=16)
    rows = sorted(run_token_pack(str(d), budget=10).take_all(),
                  key=lambda r: r["doc_id"])
    expected_off = np.concatenate(
        ([0], np.cumsum([i % 7 + 1 for i in range(n)])[:-1]))
    got = [r["start_offset"] for r in rows]
    assert got == expected_off.tolist()


def test_sample_per_group_exact_k_and_stable(ray_session):
    from dude_ray.pipelines.sampling import run_sample_per_group

    rows = run_sample_per_group(SF, k=7).take_all()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["rank"], r["doc_id"]))
    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang"])
    lang_sizes: dict[str, int] = {}
    for lang in t["lang"].to_pylist():
        lang_sizes[lang] = lang_sizes.get(lang, 0) + 1
    for lang, picks in by_lang.items():
        assert len(picks) == min(7, lang_sizes[lang])
        assert sorted(r for r, _ in picks) == list(range(1, len(picks) + 1))
    # stability: k=3 sample is a prefix of the k=7 sample per stratum
    small = run_sample_per_group(SF, k=3).take_all()
    for r in small:
        assert (r["rank"], r["doc_id"]) in by_lang[r["lang"]]


def test_parquet_sorted_probe(tmp_path):
    """Metadata probe: sorted single-file → True; shuffled data or a
    missing column → False (operators must fall back to the sort)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dude_ray.partitioning import parquet_sorted_by

    ids = np.arange(1000, dtype=np.int64)
    pq.write_table(pa.table({"doc_id": ids}),
                   tmp_path / "sorted.parquet", row_group_size=100)
    assert parquet_sorted_by(str(tmp_path / "sorted.parquet"), "doc_id")

    rng = np.random.RandomState(0)
    pq.write_table(pa.table({"doc_id": rng.permutation(ids)}),
                   tmp_path / "shuffled.parquet", row_group_size=100)
    assert not parquet_sorted_by(str(tmp_path / "shuffled.parquet"),
                                 "doc_id")
    assert not parquet_sorted_by(str(tmp_path / "sorted.parquet"), "nope")


def test_interleave_falls_back_on_unsorted(ray_session, tmp_path):
    """mix_interleave over a deliberately shuffled copy of documents
    must equal the result over the sorted original (the probe routes
    the shuffled copy through the explicit sort)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dude_ray.pipelines.sampling import run_mix_interleave

    sf = "/root/testdata/sf0.001"
    want = (run_mix_interleave(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))

    df = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet", row_group_size=64)
    got = (run_mix_interleave(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_interleave_single_rowgroup_unsorted(ray_session, tmp_path):
    """The review-flagged hole: a SINGLE-row-group file whose rows are
    internally shuffled passes the metadata probe (min/max can't see
    inside a row group) — the runtime block-order proof must catch it
    and fall back to the explicit sort, yielding correct results."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dude_ray.partitioning import parquet_sorted_by
    from dude_ray.pipelines.sampling import run_mix_interleave

    sf = "/root/testdata/sf0.001"
    want = (run_mix_interleave(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))

    df = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet",
                   row_group_size=len(df))  # ONE row group
    # the metadata probe alone is fooled...
    assert parquet_sorted_by(str(tmp_path / "documents.parquet"), "doc_id")
    # ...but the operator still returns the correct result
    got = (run_mix_interleave(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_text_chunk_windows(ray_session):
    """Chunk boundaries, overlap, and reconstruction: every chunk is
    tokens[s:s+W] for s = 0, S, 2S, ... and stride-slicing the chunks
    reconstructs the doc's full token stream exactly."""
    import re

    from dude_ray.pipelines.sampling import (CHUNK_STRIDE, CHUNK_TOKENS,
                                             run_text_chunk)
    from dude_ray.pipelines.textops import TOKEN_RE

    rows = run_text_chunk(SF).take_all()
    pat = re.compile(TOKEN_RE)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    checked = 0
    for did, chunks in list(by_doc.items())[:50]:
        toks = pat.findall(texts[did] or "")
        chunks.sort(key=lambda r: r["chunk_id"])
        for ci, r in enumerate(chunks):
            s = ci * CHUNK_STRIDE
            want = toks[s:s + CHUNK_TOKENS]
            assert r["start_tok"] == s
            assert r["chunk_tokens"] == len(want)
            assert r["chunk_text"] == " ".join(want)
        # starts cover the whole token stream: last start < n ≤ last+S
        assert (len(chunks) - 1) * CHUNK_STRIDE < len(toks)
        assert len(toks) <= len(chunks) * CHUNK_STRIDE
        checked += 1
    assert checked > 10
    # docs with zero tokens emit no chunks
    empty_ids = {d for d, tx in texts.items() if not pat.findall(tx or "")}
    assert empty_ids.isdisjoint(by_doc)


def test_shard_assign_manifest(ray_session):
    """Shard manifest equals a local per-doc recomputation, covers every
    doc exactly once, and is shard-count-stable (pure doc_id hash)."""
    import hashlib
    import re

    from dude_ray.pipelines.sampling import run_shard_assign
    from dude_ray.pipelines.textops import TOKEN_RE

    rows = {r["shard"]: r for r in run_shard_assign(SF).take_all()}
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    pat = re.compile(TOKEN_RE)
    want: dict[int, list] = {}
    for did, tx in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        s = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16) % 64
        want.setdefault(s, []).append((did, len(pat.findall(tx or ""))))
    assert set(rows) == set(want)
    for s, docs in want.items():
        r = rows[s]
        assert r["n_docs"] == len(docs)
        assert r["n_tokens"] == sum(n for _d, n in docs)
        assert r["min_doc_id"] == min(d for d, _n in docs)
        assert r["max_doc_id"] == max(d for d, _n in docs)
    assert sum(r["n_docs"] for r in rows.values()) == t.num_rows


def test_priority_sample_properties(ray_session):
    """Top-k by w/u equals a local recompute; the sample is
    deterministic; and weight bias shows (mean sampled weight exceeds
    the corpus mean — the point of size-weighted sampling)."""
    import hashlib

    from dude_ray.pipelines.sampling import _HASH_BUCKETS, run_priority_sample

    rows = run_priority_sample(SF, k=50).take_all()
    assert [r["rank"] for r in rows] == list(range(1, 51))

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "n_chars"])
    pr = {}
    for did, w in zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()):
        u = (int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16)
             % _HASH_BUCKETS + 1) / float(_HASH_BUCKETS)
        pr[did] = float(w) / u
    want = sorted(pr, key=lambda d: (-pr[d], d))[:50]
    assert [r["doc_id"] for r in rows] == want

    mean_sample = np.mean([r["weight"] for r in rows])
    mean_corpus = np.mean(t["n_chars"].to_pylist())
    assert mean_sample > mean_corpus
