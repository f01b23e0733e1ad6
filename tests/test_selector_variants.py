"""Selector-grammar variants re-encoded from the reference test suite
as SPAN-EQUALITY checks over real synthetic-corpus pages.

The reference exercises the same extraction through four selector
grammars and asserts identical saved output:

* CSS          — /root/reference/tests/test_lxml.py:13-31 (lxml_css)
* XPath with ``/text()`` / ``/@attr`` value steps
               — /root/reference/tests/test_lxml.py:55-67 (lxml_xpath),
                 /root/reference/tests/test_parsel.py (parsel_xpath)
* ``text=``    — /root/reference/tests/test_lxml.py:70-76 (lxml_text)
* ``regex=``   — /root/reference/tests/test_lxml.py:81-87 (lxml_regex)

Here each grammar drives the engine's full extract path
(compile → collect → handlers → span rows) over generator pages, and
the four span sequences must be byte-equal to each other AND to the
generator's independent golden (title, url_href) projection — locking
the r3 grammar additions (XPath axes/value steps, text/regex
selection) against regression.  No Ray needed: the extract layer is
pure functions.
"""

from __future__ import annotations

from dude_ray.rule import Rule, Selector
from dude_ray.sources.corpus import (_build_struct, _render_html,
                                     host_boundaries)
from dude_ray.stages.extract import (_CompiledRules, extract_all,
                                     parse_html, rows_to_spans)

N_DOCS = 100
TEXT = ("the quick brown fox jumps over the lazy dog and keeps going "
        "with more filler words to give paragraphs some body") * 2


def _pages(n: int = 25):
    bounds = host_boundaries(N_DOCS)
    for doc_id in range(n):
        s = _build_struct(doc_id, TEXT, N_DOCS, bounds)
        yield doc_id, s, _render_html(doc_id, s)


def _title_el(el):
    return {"title": el.text_content()}


def _title_str(text):
    return {"title": text}


def _url_el(el):
    return {"url": ("", el.attrs["href"])}


def _url_str(href):
    return {"url": ("", href)}


def _rules_css():
    g = Selector(css=".custom-group")
    return [Rule(group=g, selector=Selector(css=".title"), url_matcher="*",
                 handler=_title_el, priority=10),
            Rule(group=g, selector=Selector(css="a.url"), url_matcher="*",
                 handler=_url_el, priority=20)]


def _rules_xpath():
    """Value-step XPath program — handlers receive plain strings, as in
    the reference's lxml_xpath fixture."""
    g = Selector(xpath='.//div[contains(@class, "custom-group")]')
    return [Rule(group=g,
                 selector=Selector(
                     xpath='.//p[contains(@class, "title")]/text()'),
                 url_matcher="*", handler=_title_str, priority=10),
            Rule(group=g,
                 selector=Selector(
                     xpath='.//a[contains(@class, "url")]/@href'),
                 url_matcher="*", handler=_url_str, priority=20)]


def _rules_text():
    g = Selector(css=".custom-group")
    return [Rule(group=g, selector=Selector(text="Title"), url_matcher="*",
                 handler=_title_el, priority=10),
            Rule(group=g, selector=Selector(css="a.url"), url_matcher="*",
                 handler=_url_el, priority=20)]


def _rules_regex():
    g = Selector(css=".custom-group")
    return [Rule(group=g, selector=Selector(regex=r"Title\s\d"),
                 url_matcher="*", handler=_title_el, priority=10),
            Rule(group=g, selector=Selector(css="a.url"), url_matcher="*",
                 handler=_url_el, priority=20)]


def _spans(rules, html, url):
    comp = _CompiledRules(rules)
    return rows_to_spans(extract_all(comp, parse_html(html), url))


def test_selector_grammar_variants_span_equal():
    n_checked = 0
    for doc_id, s, html in _pages():
        url = f"https://example.test/docs/{doc_id}.html"
        base = _spans(_rules_css(), html, url)
        # independent golden from the generator's structure list:
        # per group one title span then one url span, group 0 first
        golden = []
        for g in s.groups:
            golden.append(("title", g["title"], ""))
            golden.append(("url", "", g["url_href"]))
        assert [(sp["kind"], sp["text"], sp["media_ref"])
                for sp in base] == golden
        for variant in (_rules_xpath, _rules_text, _rules_regex):
            assert _spans(variant(), html, url) == base, variant.__name__
        n_checked += len(base)
    assert n_checked > 100


def test_value_step_and_element_counts_agree():
    """The /text() and /@href value steps must yield exactly one string
    per matched element — no dropped or duplicated spans across the
    grammar variants on any page."""
    for doc_id, s, html in _pages(10):
        url = f"https://example.test/docs/{doc_id}.html"
        spans = _spans(_rules_xpath(), html, url)
        assert len(spans) == 2 * len(s.groups)
        assert [sp["offset"] for sp in spans] == list(range(len(spans)))
