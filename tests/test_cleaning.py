"""Corpus-cleaning operator tests: planted PII, unicode normalization
edge cases, repetition stats on crafted documents, decontamination of
planted benchmark snippets, deterministic top-terms ranking."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts, *, sources=None, ids=None):
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(ids or list(range(n)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources or ["x"] * n),
        "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
    })
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_pii_redact_planted(ray_session, tmp_path):
    from dude_ray.pipelines.cleaning import run_pii_redact

    sf = _write_docs(tmp_path, [
        "contact bob.smith+x@example.co.uk or 555-123-4567 now",
        "server at 192.168.1.255 and 10.0.0.1, call 555.987.6543",
        "nothing sensitive here",
        "two mails a@b.io c@d.org",
    ])
    rows = {r["doc_id"]: r for r in run_pii_redact(sf).take_all()}
    assert rows[0]["n_email"] == 1 and rows[0]["n_phone"] == 1
    assert rows[0]["clean_text"] == "contact <EMAIL> or <PHONE> now"
    assert rows[1]["n_ipv4"] == 2 and rows[1]["n_phone"] == 1
    assert rows[1]["clean_text"] == "server at <IP> and <IP>, call <PHONE>"
    assert rows[2]["clean_text"] == "nothing sensitive here"
    assert rows[2]["n_email"] == rows[2]["n_phone"] == rows[2]["n_ipv4"] == 0
    assert rows[3]["n_email"] == 2


def test_text_normalize_unicode(ray_session, tmp_path):
    from dude_ray.pipelines.cleaning import run_text_normalize

    # 'e' + combining acute (NFD) must NFC-fold to the composed char
    nfd = "Café  \t Menu\n\nX"
    sf = _write_docs(tmp_path, [nfd, "  AlReAdY clean  "])
    rows = {r["doc_id"]: r for r in run_text_normalize(sf).take_all()}
    assert rows[0]["norm_text"] == "café menu x"
    assert rows[0]["n_chars_norm"] == len("café menu x")
    assert rows[1]["norm_text"] == "already clean"


def test_repetition_stats(ray_session, tmp_path):
    from dude_ray.pipelines.cleaning import run_repetition_quality

    sf = _write_docs(tmp_path, [
        "spam spam spam spam",       # 4 words, 1 distinct
        "all words here differ",     # 0 repetition
        "",                          # empty doc
        "a b a b c",                 # 5 words, 3 distinct, top=2
    ])
    rows = {r["doc_id"]: r for r in run_repetition_quality(sf).take_all()}
    assert rows[0]["n_words"] == 4 and rows[0]["n_distinct"] == 1
    assert rows[0]["dup_word_frac"] == 0.75 and rows[0]["top_word_frac"] == 1.0
    assert rows[1]["dup_word_frac"] == 0.0
    assert rows[2]["n_words"] == 0 and rows[2]["dup_word_frac"] == 0.0
    assert rows[3]["n_distinct"] == 3 and rows[3]["top_word_frac"] == 0.4


def test_decontaminate_flags_planted(ray_session, tmp_path):
    from dude_ray.pipelines.cleaning import (SNIPPET_LEN, SNIPPET_MOD,
                                             run_decontaminate)

    bench = "the quick brown fox jumps over the lazy benchmark dog"
    snippet = bench[:SNIPPET_LEN]
    texts, ids = [], []
    for i in range(6):
        ids.append(i * SNIPPET_MOD if i < 2 else i * SNIPPET_MOD + 1)
        texts.append(bench if i == 0 else
                     f"prefix {snippet} suffix" if i == 3 else
                     f"clean document number {i} with plain words")
    sf = _write_docs(tmp_path, texts, ids=ids)
    rows = {r["doc_id"]: r["contaminated"]
            for r in run_decontaminate(sf).take_all()}
    assert rows[0] == 1                       # the benchmark doc itself
    assert rows[3 * SNIPPET_MOD + 1] == 1     # verbatim snippet inside
    assert rows[2 * SNIPPET_MOD + 1] == 0     # clean
    # doc_id 97 (i=1) is also % 97 == 0 → its own prefix is a snippet
    assert rows[SNIPPET_MOD] == 1


def test_top_terms_deterministic_ties(ray_session, tmp_path):
    from dude_ray.pipelines.cleaning import run_top_terms_per_source

    sf = _write_docs(
        tmp_path,
        ["b a c a b", "z z q", "c"],
        sources=["s1", "s2", "s1"],
    )
    out = run_top_terms_per_source(sf, k=2).take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["rank"], r["term"], r["n"]))
    for v in by_src.values():
        v.sort()
    # s1: a=2, b=2, c=2 → tie broken alphabetically
    assert by_src["s1"] == [(1, "a", 2), (2, "b", 2)]
    assert by_src["s2"] == [(1, "z", 2), (2, "q", 1)]


def test_cleaning_real_corpus_row_counts(ray_session):
    """All four per-doc ops preserve cardinality on the real table."""
    from dude_ray.pipelines import cleaning

    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert cleaning.run_pii_redact(SF).count() == n
    assert cleaning.run_text_normalize(SF).count() == n
    assert cleaning.run_repetition_quality(SF).count() == n
    assert cleaning.run_decontaminate(SF).count() == n


def test_curate_keep_best_semantics(ray_session):
    """Every component keeps exactly one doc; the keeper is a member
    with the max stop_ratio (ties → lowest doc_id); unclustered docs
    keep themselves."""
    from dude_ray.pipelines.cleaning import run_curate_keep_best
    from dude_ray.pipelines.dedup import run_dup_clusters
    from dude_ray.pipelines.textops import run_quality

    sf = "/root/testdata/sf0.001"
    kept = run_curate_keep_best(sf).to_pandas()
    comps = run_dup_clusters(sf).to_pandas()
    quality = run_quality(sf).to_pandas().set_index("doc_id")["stop_ratio"]

    comp_of = dict(zip(comps["vec_id"], comps["component"]))
    assert kept["component"].is_unique
    # total components = distinct near-dup components + unclustered docs
    n_docs = len(quality)
    assert len(kept) == comps["component"].nunique() + (n_docs - len(comps))
    for _, row in kept.iterrows():
        members = [v for v, c in comp_of.items() if c == row["component"]]
        if not members:
            members = [row["component"]]  # unclustered: itself
        best = max(members, key=lambda d: (quality[d], -d))
        assert row["doc_id"] == best
        assert row["stop_ratio"] == quality[best]


def test_gopher_filter_rules(ray_session):
    """Every reported rule column recomputes from the text; keep is
    the conjunction of the four Gopher rules."""
    import re

    import pyarrow.parquet as pq

    from dude_ray.pipelines.cleaning import (GOPHER_MEAN_LEN,
                                             GOPHER_MIN_ALPHA_FRAC,
                                             GOPHER_MIN_STOP_FRAC,
                                             GOPHER_MIN_TOKENS,
                                             run_gopher_filter)
    from dude_ray.pipelines.textops import STOPWORDS, TOKEN_RE

    sf = "/root/testdata/sf0.001"
    got = {r["doc_id"]: r for r in run_gopher_filter(sf).take_all()}
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])
    tok = re.compile(TOKEN_RE)
    stops = frozenset(STOPWORDS)
    n_checked = 0
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = tok.findall((text or "").lower())
        if not toks:
            assert did not in got
            continue
        r = got[did]
        n = len(toks)
        assert r["n_tokens"] == n
        mean_len = sum(map(len, toks)) / n
        stop_frac = sum(t_ in stops for t_ in toks) / n
        alpha_frac = sum(any(c.isalpha() for c in t_) for t_ in toks) / n
        assert r["mean_tok_len"] == round(mean_len, 6)
        assert r["stop_frac"] == round(stop_frac, 6)
        assert r["alpha_frac"] == round(alpha_frac, 6)
        want_keep = int(GOPHER_MIN_TOKENS <= n <= 100_000
                        and GOPHER_MEAN_LEN[0] <= mean_len <= GOPHER_MEAN_LEN[1]
                        and stop_frac >= GOPHER_MIN_STOP_FRAC
                        and alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        assert r["keep"] == want_keep
        n_checked += 1
    assert n_checked == len(got)
