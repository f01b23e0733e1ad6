"""Extraction-semantics tests — the reference's per-backend full-flow
suites (/root/reference/tests/test_bs4.py, test_lxml.py, test_parsel.py)
re-encoded against the single Arrow extractor."""

from dude_ray.stages.extract import (
    _CompiledRules,
    extract_all,
    extract_page_flat,
    flatten,
    rows_to_spans,
)
from dude_ray.htmlparser import parse_html


def compiled_for(app):
    return _CompiledRules(list(app.build_spec().scraping_rules()))


def make_css_rules(app):
    @app.group(css=".custom-group")
    @app.select(css=".title")
    def title(el):
        return {"title": el.text_content()}

    @app.select(css="a.url", group_css=".custom-group")
    def url(el):
        return {"url": el.attrs["href"]}


def test_full_flow_css(app, dude_html, base_url, expected_data):
    """(/root/reference/tests/test_bs4.py:171-189 golden)"""
    make_css_rules(app)
    rows = extract_page_flat(compiled_for(app), dude_html, base_url)
    assert rows == expected_data


def test_full_flow_xpath(app, dude_html, base_url, expected_data):
    """(/root/reference/tests/test_lxml.py:55-63,178): xpath selectors
    with /text() and /@href terminal steps."""

    @app.select(xpath='.//p[contains(@class, "title")]/text()',
                group_xpath='.//div[contains(@class, "custom-group")]')
    def title(el):
        return {"title": el}

    @app.select(xpath='.//a[contains(@class, "url")]/@href',
                group_xpath='.//div[contains(@class, "custom-group")]')
    def url(el):
        return {"url": el}

    rows = extract_page_flat(compiled_for(app), dude_html, base_url)
    assert rows == expected_data


def test_full_flow_parsel_pseudo(app, dude_html, base_url, expected_data):
    """parsel ::text / ::attr() pseudo-elements
    (/root/reference/tests/test_parsel.py:30-40)."""

    @app.select(css=".title::text", group_css=".custom-group")
    def title(el):
        return {"title": el}

    @app.select(css="a.url::attr(href)", group_css=".custom-group")
    def url(el):
        return {"url": el}

    rows = extract_page_flat(compiled_for(app), dude_html, base_url)
    assert rows == expected_data


def test_text_selector(app, dude_html, base_url):
    """text= selects elements whose direct text contains the needle
    (/root/reference/tests/test_lxml.py:178-226 family)."""

    @app.select(text="Title", group_css=".custom-group")
    def title(el):
        return {"title": el.text_content()}

    rows = extract_page_flat(compiled_for(app), dude_html, base_url)
    assert [r["title"] for r in rows] == ["Title 1", "Title 2", "Title 3"]


def test_regex_selector(app, dude_html, base_url):
    @app.select(regex=r"title\s\d", group_css=".custom-group")  # case-insensitive
    def title(el):
        return {"title": el.text_content()}

    rows = extract_page_flat(compiled_for(app), dude_html, base_url)
    assert [r["title"] for r in rows] == ["Title 1", "Title 2", "Title 3"]


def test_generator_handler(app, dude_html, base_url):
    """Generator handlers fan out with re-assigned element_index
    (/root/reference/dude/base.py:541-551; golden
    /root/reference/tests/conftest.py:139-169)."""

    @app.select(css="body")  # one element; handler yields 3 dicts
    def generator(el):
        for grp in el.iter():
            if "custom-group" not in grp.classes:
                continue
            url = next(e.attrs["href"] for e in grp.iter() if e.tag == "a")
            title = next(e.text_content() for e in grp.iter()
                         if e.tag == "p" and "title" in e.classes)
            yield {"url": url, "title": title}

    rows = extract_page_flat(compiled_for(app), dude_html, base_url)
    assert rows == [
        {"_page_number": 1, "_page_url": base_url, "_group_id": 0,
         "_group_index": 0, "_element_index": i,
         "url": f"url-{i + 1}.html", "title": f"Title {i + 1}"}
        for i in range(3)
    ]


def test_empty_dict_handler_filtered(app, dude_html, base_url):
    """Falsy handler results contribute nothing
    (/root/reference/dude/base.py:553-554; /root/reference/tests/test_bs4.py:31-33)."""

    @app.select(css=".title", group_css=".custom-group")
    def empty(el):
        return {}

    assert extract_page_flat(compiled_for(app), dude_html, base_url) == []


def test_url_match_filters_rules(app, dude_html, base_url):
    """url_match glob gates which rules fire
    (/root/reference/dude/rule.py:78-86)."""

    @app.select(css=".title", group_css=".custom-group", url_match="https://other.example/*")
    def title(el):
        return {"title": el.text_content()}

    @app.select(css="a.url", group_css=".custom-group", url_match="https://dwmc.ron.sh*")
    def url(el):
        return {"url": el.attrs["href"]}

    rows = extract_page_flat(compiled_for(app), dude_html, base_url)
    assert all("title" not in r for r in rows)
    assert [r["url"] for r in rows] == ["url-1.html", "url-2.html", "url-3.html"]


def test_priority_orders_handler_merge(app, dude_html, base_url):
    """Within a group, rules run in priority order (lowest first —
    /root/reference/dude/base.py:168); later handlers win key collisions
    (last-writer-wins dict.update, /root/reference/dude/base.py:617)."""

    @app.select(css=".title", group_css=".custom-group", priority=200)
    def low(el):
        return {"who": "low"}

    @app.select(css=".title", group_css=".custom-group", priority=1)
    def high(el):
        return {"who": "high"}

    rows = extract_page_flat(compiled_for(app), dude_html, base_url)
    assert all(r["who"] == "low" for r in rows)


def test_missing_description_group(app, dude_html, base_url):
    """Group 2 of the fixture has no .description — its row simply lacks
    the key (CSV header union handles it downstream)."""

    @app.select(css=".title", group_css=".custom-group")
    def title(el):
        return {"title": el.text_content()}

    @app.select(css=".description", group_css=".custom-group")
    def description(el):
        return {"description": el.text_content()}

    rows = extract_page_flat(compiled_for(app), dude_html, base_url)
    assert "description" in rows[0] and "description" in rows[2]
    assert "description" not in rows[1]


def test_multiple_group_selectors_do_not_merge(app, base_url):
    """Two group selectors with equal group_index must not merge — the
    deterministic group ordinal replaces the reference's id(group)
    (/root/reference/dude/scraped_data.py:18-19)."""
    html = '<div class="g1"><p class="a">A</p></div><div class="g2"><p class="b">B</p></div>'

    @app.select(css=".a", group_css=".g1")
    def a(el):
        return {"a": el.text_content()}

    @app.select(css=".b", group_css=".g2")
    def b(el):
        return {"b": el.text_content()}

    rows = extract_page_flat(compiled_for(app), html, base_url)
    assert len(rows) == 2
    assert {"a"} <= set(rows[0]) or {"a"} <= set(rows[1])
    assert not any("a" in r and "b" in r for r in rows)


def test_spans_output(app, dude_html, base_url):
    """Span-sequence contract: (kind, text, media_ref, offset) in
    deterministic (group_index, element_index) order."""

    @app.select(css=".title", group_css=".custom-group")
    def title(el):
        return {"title": el.text_content()}

    @app.select(css="a.url", group_css=".custom-group")
    def url(el):
        return {"url": (el.text_content(), el.attrs["href"])}

    dom = parse_html(dude_html)
    rows = list(extract_all(compiled_for(app), dom, base_url))
    spans = rows_to_spans(rows)
    assert spans == [
        {"kind": "title", "text": "Title 1", "media_ref": "", "offset": 0},
        {"kind": "url", "text": "Title 1", "media_ref": "url-1.html", "offset": 1},
        {"kind": "title", "text": "Title 2", "media_ref": "", "offset": 2},
        {"kind": "url", "text": "Title 2", "media_ref": "url-2.html", "offset": 3},
        {"kind": "title", "text": "Title 3", "media_ref": "", "offset": 4},
        {"kind": "url", "text": "Title 3", "media_ref": "url-3.html", "offset": 5},
    ]
