"""Property-based equivalence fuzzing (hypothesis, derandomized).

* The fast tokenizer must agree with the stdlib-reference strict parser
  on arbitrary structured HTML covering every quoting style the
  tokenizer special-cases (the round-2 advisory bug — unquoted values
  ending in '/' — lived exactly in this space).
* URL canonicalization must be idempotent and produce RFC-safe output
  for arbitrary path/query/fragment garbage.
"""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

_TAGS = ["div", "p", "a", "span", "li", "em", "td"]
_VOID = ["br", "img", "hr", "input"]
_ATTR_NAMES = st.text(alphabet=string.ascii_lowercase, min_size=1,
                      max_size=6)
_TEXT = st.text(alphabet=string.ascii_letters + " &<>;#'\"/=%", min_size=0,
                max_size=12).map(
    lambda s: s.replace("<", "&lt;"))  # free text must not open a tag


def _attr_value_forms(name: str, value: str) -> st.SearchStrategy[str]:
    dq = value.replace('"', "")
    sq = value.replace("'", "")
    uq = "".join(c for c in value if c not in " \t\n\"'=<>`") or "v"
    return st.sampled_from([
        f'{name}="{dq}"',
        f"{name}='{sq}'",
        f"{name}={uq}",
        name,  # bare attribute
    ])


_ATTR = st.tuples(
    _ATTR_NAMES,
    st.text(alphabet=string.ascii_letters + "/%&#;:.-", min_size=0,
            max_size=10),
).flatmap(lambda t: _attr_value_forms(*t))


@st.composite
def _element(draw, depth=0):
    tag = draw(st.sampled_from(_TAGS + _VOID))
    attrs = draw(st.lists(_ATTR, max_size=3))
    open_tag = "<" + tag + ("" if not attrs else " " + " ".join(attrs))
    if tag in _VOID:
        return open_tag + draw(st.sampled_from([">", "/>", " />"]))
    inner = draw(_fragment(depth + 1)) if depth < 3 else draw(_TEXT)
    closed = draw(st.booleans())
    return open_tag + ">" + inner + (f"</{tag}>" if closed else "")


def _fragment(depth=0):
    return st.lists(
        st.one_of(_TEXT, _element(depth)), max_size=4).map("".join)


def _norm(el):
    kids, buf = [], []
    for c in el.children:
        if isinstance(c, str):
            buf.append(c)
        else:
            if buf:
                kids.append("".join(buf))
                buf = []
            kids.append(_norm(c))
    if buf:
        kids.append("".join(buf))
    return (el.tag, dict(el.attrs), kids)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(_fragment())
def test_fast_tokenizer_matches_strict_fuzz(html):
    from dude_ray.htmlparser import parse_html, parse_html_strict

    assert _norm(parse_html(html)) == _norm(parse_html_strict(html))


_URLISH = st.text(
    alphabet=string.ascii_letters + string.digits + "/.%?#&=+~ :@!$'()*,;-_",
    min_size=0, max_size=40)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(_URLISH)
def test_canonicalize_idempotent_fuzz(tail):
    from dude_ray.canonical import canonicalize_url

    url = "http://ex.com/" + tail
    once = canonicalize_url(url)
    if once is None:
        return
    assert canonicalize_url(once) == once
    # canonical output never contains raw spaces or stray '%' escapes
    assert " " not in once
    import re

    for m in re.finditer("%", once):
        assert re.match("%[0-9A-Fa-f]{2}", once[m.start():m.start() + 3])


# --------------------------------------------------------------------------
# prefix-filter recall theorem (jaccard_join core)
# --------------------------------------------------------------------------

import numpy as np

_GRAM = st.integers(min_value=0, max_value=40)  # tiny universe → hot grams
_DOC = st.lists(_GRAM, min_size=1, max_size=25).map(
    lambda xs: np.unique(np.asarray(xs, dtype=np.uint64)))


@settings(max_examples=300, deadline=None, derandomize=True)
@given(
    docs=st.lists(_DOC, min_size=2, max_size=8),
    heavy=st.lists(_GRAM, max_size=10).map(
        lambda xs: np.unique(np.asarray(xs, dtype=np.uint64))),
    threshold=st.sampled_from([0.5, 0.7, 0.8, 0.9, 1.0]),
)
def test_prefix_filter_recall_theorem(docs, heavy, threshold):
    """Any doc pair with Jaccard ≥ threshold MUST share at least one
    gram from both docs' prefixes — under the exact production prefix
    implementation (_prefix_grams), for arbitrary heavy-demotion sets
    (the ordering hint may be wrong/empty/stale; correctness may not
    depend on it)."""
    from dude_ray.pipelines.dedup import _prefix_grams

    t_eff = threshold - 1e-6
    prefixes = [set(_prefix_grams(g, len(g), t_eff, heavy).tolist())
                for g in docs]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = set(docs[i].tolist()), set(docs[j].tolist())
            union = len(a | b)
            if not union:
                continue
            jac = len(a & b) / union
            if jac >= threshold:
                assert prefixes[i] & prefixes[j], (
                    f"recall violated: jac={jac} docs={docs[i]},{docs[j]} "
                    f"heavy={heavy} t={threshold}")


# --------------------------------------------------------------------------
# cross-engine oracle parity on arbitrary Unicode text
# --------------------------------------------------------------------------

_UNITEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Lo", "Nd", "Zs", "Po"),
        whitelist_characters="_\n\tİßΣσés"),
    min_size=0, max_size=400)


@settings(deadline=None, max_examples=40)
@given(text=_UNITEXT)
def test_text_chunk_oracle_parity_fuzz(text):
    """The engine's chunk kernel and the DuckDB oracle CTE must agree
    on ARBITRARY Unicode input (the shipped corpora are ASCII, so this
    is the only coverage of the special-casing space where Python and
    DuckDB string semantics can diverge)."""
    import re

    import duckdb

    from dude_ray.pipelines.sampling import CHUNK_STRIDE, CHUNK_TOKENS

    pat = re.compile(r"[A-Za-z0-9_]+")
    toks = pat.findall(text)
    want = [(ci * CHUNK_STRIDE,
             " ".join(toks[ci * CHUNK_STRIDE:ci * CHUNK_STRIDE
                           + CHUNK_TOKENS]))
            for ci in range((len(toks) + CHUNK_STRIDE - 1) // CHUNK_STRIDE)]

    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT 0 AS doc_id, ? AS text", [text])
    got = con.execute("""
        WITH tok AS (
            SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks
            FROM d
        ), nz AS (
            SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
            FROM tok WHERE len(toks) > 0
        ), st AS (
            SELECT doc_id, toks, n, unnest(range(0, n, 48)) AS s FROM nz
        )
        SELECT CAST(s AS BIGINT),
               array_to_string(toks[s + 1 : least(s + 64, n)], ' ')
        FROM st ORDER BY 1
    """).fetchall()
    assert [(s, t) for s, t in got] == want


@settings(deadline=None, max_examples=40)
@given(text=_UNITEXT)
def test_bpe_pairs_oracle_parity_fuzz(text):
    """Extract-then-lower must agree between Python and DuckDB on
    arbitrary Unicode (lower() applied to whole text would NOT — e.g.
    U+0130 — which is why the kernel lowercases per ASCII token)."""
    import re
    from collections import Counter

    import duckdb

    pat = re.compile(r"[A-Za-z0-9_]+")
    want: Counter = Counter()
    for w in pat.findall(text):
        w = w.lower()
        want.update(zip(w, w[1:]))

    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT ? AS text", [text])
    got = {(a, b): n for a, b, n in con.execute("""
        WITH w AS (
            SELECT lower(unnest(regexp_extract_all(
                text, '[A-Za-z0-9_]+'))) AS word FROM d
        ), e AS (
            SELECT word, unnest(generate_series(1, length(word) - 1)) AS i
            FROM w
        )
        SELECT substr(word, i, 1), substr(word, i + 1, 1), count(*)
        FROM e GROUP BY 1, 2
    """).fetchall()}
    assert got == dict(want)


@settings(deadline=None, max_examples=40)
@given(text=_UNITEXT)
def test_char_entropy_oracle_parity_fuzz(text):
    """Per-doc character entropy at the 6-dp contract must agree
    between the numpy kernel and the DuckDB formula on arbitrary
    Unicode text."""
    import duckdb
    import numpy as np

    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    if len(cp):
        _u, c = np.unique(cp, return_counts=True)
        cf = c.astype(np.float64)
        n = float(len(cp))
        want = round(float(np.log2(n) - np.dot(cf, np.log2(cf)) / n), 6)
        want_d = len(c)
    else:
        want, want_d = 0.0, 0

    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT 0 AS doc_id, ? AS text", [text])
    got = con.execute("""
        WITH idx AS (
            SELECT doc_id, text,
                   unnest(generate_series(1, length(text))) AS i FROM d
        ), cc AS (
            SELECT doc_id, substr(text, i, 1) AS ch,
                   CAST(count(*) AS DOUBLE) AS c
            FROM idx GROUP BY doc_id, ch
        ), agg AS (
            SELECT doc_id, sum(c) AS n,
                   CAST(count(*) AS BIGINT) AS n_distinct_chars,
                   sum(c * log2(c)) AS s
            FROM cc GROUP BY doc_id
        )
        SELECT coalesce(a.n_distinct_chars, 0),
               coalesce(round(log2(a.n) - a.s / a.n, 6), 0.0)
        FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """).fetchone()
    assert got[0] == want_d
    assert abs(got[1] - want) <= 1e-6


@given(st.lists(st.text(min_size=0, max_size=60), min_size=1, max_size=8))
@settings(max_examples=60, deadline=None, derandomize=True)
def test_bloom_bits_cross_engine_on_arbitrary_unicode(texts):
    """bloom_bits' md5-slice positions must equal DuckDB's
    md5_number_lower slices for ARBITRARY Unicode text — locks the
    UTF-8 encoding contract between hashlib and DuckDB VARCHAR
    hashing (surrogates are excluded: parquet/DuckDB VARCHAR cannot
    carry them, so the engine never sees one)."""
    import duckdb
    import numpy as np

    from dude_ray.pipelines.sketches import BLOOM_K, BLOOM_M, bloom_bits

    texts = ["".join(c for c in t if not 0xD800 <= ord(c) <= 0xDFFF)
             for t in texts]
    got = set(bloom_bits(texts).tolist())
    con = duckdb.connect()
    want = set()
    for t in texts:
        (h,) = con.execute("SELECT md5_number_lower(?)", [t]).fetchone()
        h = np.uint64(h)
        for j in range(BLOOM_K):
            want.add(int((h >> np.uint64(16 * j)) & np.uint64(BLOOM_M - 1)))
    assert got == want


@given(st.text(alphabet="abcé日", max_size=8),
       st.text(alphabet="abcé日", max_size=8))
@settings(max_examples=200, deadline=None, derandomize=True)
def test_lev_le1_bytes_matches_dp_and_duckdb(x, y):
    """_lev_le1_bytes (the editdist_neardup verify kernel) must agree
    with a full DP Levenshtein over the UTF-8 BYTES on arbitrary
    short strings — including multi-byte characters, where the
    byte-based contract (matching DuckDB's levenshtein) differs from
    code-point distance."""
    from dude_ray.pipelines.dedup import _lev_le1_bytes

    def dp(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    xb, yb = x.encode(), y.encode()
    d = dp(xb, yb)
    got = _lev_le1_bytes(xb, yb)
    assert got == (d if d <= 1 else None)

    import duckdb
    (dd,) = duckdb.connect().execute(
        "SELECT levenshtein(?, ?)", [x, y]).fetchone()
    assert dd == d


@settings(max_examples=60, deadline=None)
@given(
    a=st.lists(st.integers(min_value=0, max_value=40), min_size=0,
               max_size=30),
    b=st.lists(st.integers(min_value=0, max_value=40), min_size=0,
               max_size=30),
)
def test_containment_kernel_invariants_fuzz(a, b):
    """_containment_join_batch on arbitrary hash sets: containment is
    |A∩B|/min sizes, always >= the jaccard of the same sets, in
    [0, 1], and symmetric in (a, b)."""
    import pyarrow as pa

    from dude_ray.pipelines.dedup import (_containment_join_batch,
                                          _jaccard_join_batch)

    xa = np.unique(np.asarray(a, dtype=np.uint64))
    xb = np.unique(np.asarray(b, dtype=np.uint64))
    batch = pa.table({
        "a": pa.array([1], type=pa.int64()),
        "b": pa.array([2], type=pa.int64()),
        "sh_a": pa.array([xa.astype("<u8").tobytes()],
                         type=pa.binary()),
        "sh_b": pa.array([xb.astype("<u8").tobytes()],
                         type=pa.binary()),
    })
    got = _containment_join_batch(batch).to_pandas().iloc[0]
    jac = _jaccard_join_batch(batch).to_pandas().iloc[0]["jaccard"]
    inter = len(np.intersect1d(xa, xb))
    m = min(len(xa), len(xb))
    assert got["n_inter"] == inter
    assert got["containment"] == (round(inter / m, 6) if m else 0.0)
    assert 0.0 <= got["containment"] <= 1.0
    assert got["containment"] >= jac - 1e-9

    flipped = pa.table({
        "a": batch["a"], "b": batch["b"],
        "sh_a": batch["sh_b"], "sh_b": batch["sh_a"]})
    got2 = _containment_join_batch(flipped).to_pandas().iloc[0]
    assert got2["containment"] == got["containment"]
    assert got2["n_inter"] == got["n_inter"]
