"""Scraper application-layer tests — the reference's full-flow suites
re-encoded against ``dude_ray.Scraper`` over local ``file://`` pages
(the reference's browser tests run on local files too —
/root/reference/tests/conftest.py:50-54).
"""

import json
from unittest import mock

import pytest

import dude_ray
from dude_ray.scraper import Scraper


@pytest.fixture()
def site(tmp_path, dude_html):
    """A 3-page local site: index (dude.html shape) → page2 → page3,
    plus a dead link."""
    (tmp_path / "index.html").write_text(dude_html)
    (tmp_path / "url-1.html").write_text(
        '<div class="custom-group"><a class="url" href="index.html">'
        '<p class="title">Page 1</p></a></div>')
    (tmp_path / "url-2.html").write_text(
        '<div class="custom-group"><a class="url" href="url-1.html">'
        '<p class="title">Page 2</p></a></div>')
    # url-3.html and empty.html intentionally missing (dead links)
    return tmp_path


def file_url(p) -> str:
    return f"file://{p}"


def css_rules(app):
    @app.select(css=".title", group_css=".custom-group")
    def title(el):
        return {"title": el.text_content()}

    @app.select(css="a.url", group_css=".custom-group")
    def url(el):
        return {"url": el.attrs["href"]}


def test_full_flow_with_custom_save(ray_session, site):
    """(/root/reference/tests/test_bs4.py:171-189): run + @save("custom")
    called with the flattened rows."""
    app = Scraper()
    css_rules(app)
    db = mock.MagicMock()

    @app.save("custom")
    def save_custom(data, output):
        db.save(data)
        return True

    rows = app.run(urls=[file_url(site / "index.html")], format="custom")
    assert [r["title"] for r in rows] == ["Title 1", "Title 2", "Title 3"]
    assert [r["url"] for r in rows] == ["url-1.html", "url-2.html", "url-3.html"]
    assert all(r["_page_number"] == 1 for r in rows)
    db.save.assert_called_once_with(rows)


def test_follow_urls_visits_exact_set(ray_session, site):
    """(/root/reference/tests/test_bs4.py:192-221): follow_urls crawls
    linked pages; dead links fail quietly; revisits deduped."""
    app = Scraper()
    css_rules(app)
    rows = app.run(urls=[file_url(site / "index.html")], follow_urls=True)
    pages = {r["_page_url"].rsplit("/", 1)[-1] for r in rows}
    assert pages == {"index.html", "url-1.html", "url-2.html"}


def test_fetch_error_skips(ray_session, site):
    """(/root/reference/tests/test_bs4.py:224-238): missing page → no
    rows, no crash."""
    app = Scraper()
    css_rules(app)
    rows = app.run(urls=[file_url(site / "nope.html")])
    assert rows == []


def test_blocklist_blocks_fetch(ray_session, site):
    """Adblock analog (/root/reference/tests/test_bs4.py:340-371): a
    blocklisted URL is never fetched."""
    app = Scraper()
    css_rules(app)
    rows = app.run(urls=[file_url(site / "index.html")],
                   blocklist=("*index.html",))
    assert rows == []


def test_save_per_page(ray_session, site):
    """(/root/reference/tests/test_playwright_sync.py custom per-page
    save): per-page handler called once per page with that page's rows."""
    app = Scraper()
    css_rules(app)
    calls = []

    @app.save("custom", is_per_page=True)
    def save_pp(data, output):
        calls.append(list(data))
        return True

    app.run(urls=[file_url(site / "index.html")], follow_urls=True,
            format="custom", save_per_page=True)
    assert len(calls) == 3  # one per fetched page with rows
    assert all(len(c) >= 1 for c in calls)


def test_events_order(ray_session, site):
    """startup → (per page: pre-setup, post-setup) → shutdown
    (/root/reference/dude/base.py:269-338)."""
    app = Scraper()
    css_rules(app)
    order = []

    @app.startup()
    def on_start():
        order.append("startup")

    @app.shutdown()
    def on_stop():
        order.append("shutdown")

    app.run(urls=[file_url(site / "index.html")])
    assert order == ["startup", "shutdown"]


def test_setup_rules_can_mutate_dom(ray_session, site):
    """@select(setup=True) runs before extraction, priority-ordered,
    handler(element, page) (/root/reference/dude/playwright_scraper.py:71-85)."""
    app = Scraper()

    @app.select(css=".title", setup=True)
    def hide(el, page):
        el.attrs["data-seen"] = "1"

    @app.select(css=".title", group_css=".custom-group")
    def title(el):
        return {"title": el.text_content(), "seen": el.attrs.get("data-seen")}

    rows = app.run(urls=[file_url(site / "index.html")])
    assert all(r["seen"] == "1" for r in rows)


def test_navigate_pages_limit(ray_session, tmp_path):
    """navigate=True rules + pages bound the pagination loop
    (/root/reference/dude/playwright_scraper.py:103-129,190-199)."""
    for i in range(5):
        nxt = f'<div class="pagination"><a class="next" href="p{i + 1}.html">Next</a></div>' if i < 4 else ""
        (tmp_path / f"p{i}.html").write_text(
            f'<div class="custom-group"><a class="url" href="x.html">'
            f'<p class="title">Item {i}</p></a></div>{nxt}')
    app = Scraper()
    css_rules(app)

    @app.select(css="a.next", navigate=True)
    def nav(el, page):
        return el.attrs["href"]

    rows = app.run(urls=[file_url(tmp_path / "p0.html")], pages=3)
    assert [r["title"] for r in rows] == ["Item 0", "Item 1", "Item 2"]
    assert [r["_page_number"] for r in rows] == [1, 2, 3]


def test_follow_url_helper(ray_session, site):
    """dude.follow_url() enqueues from inside a handler
    (/root/reference/tests/test_bs4.py:154-168)."""
    app = Scraper()
    target = file_url(site / "url-2.html")

    @app.select(css=".title", group_css=".custom-group")
    def title(el):
        if el.text_content() == "Title 1":
            dude_ray.follow_url(target)
        return {"title": el.text_content()}

    rows = app.run(urls=[file_url(site / "index.html")])
    pages = {r["_page_url"].rsplit("/", 1)[-1] for r in rows}
    assert pages == {"index.html", "url-2.html"}


def test_start_requests(ray_session, site):
    """@start_requests rows join the frontier after seeds and bypass the
    domain gate (/root/reference/tests/test_bs4.py:374-398)."""
    app = Scraper()
    css_rules(app)

    @app.start_requests()
    def reqs():
        yield dude_ray.SeedRequest(url=file_url(site / "url-2.html"), method="POST")

    rows = app.run(urls=[file_url(site / "index.html")])
    pages = {r["_page_url"].rsplit("/", 1)[-1] for r in rows}
    assert pages == {"index.html", "url-2.html"}


def test_json_output_file(ray_session, site, tmp_path):
    """Storage round trip through run(output=...)
    (/root/reference/tests/test_playwright_sync.py:289-375)."""
    app = Scraper()
    css_rules(app)
    out = tmp_path / "result.json"
    rows = app.run(urls=[file_url(site / "index.html")], output=str(out))
    assert json.loads(out.read_text()) == rows


def test_module_level_run(ray_session, site):
    """`import dude; @dude.select(...); dude.run(urls=...)` — the
    reference's module-level singleton is a Scraper with a bound run
    (/root/reference/dude/context.py:7-18)."""
    import importlib

    import dude_ray as dr

    app = dr.default_app()
    saved_rules = list(app.rules)
    try:
        @dr.select(css=".title", group_css=".custom-group")
        def title(el):
            return {"title": el.text_content()}

        rows = dr.run(urls=[file_url(site / "index.html")])
        assert [r["title"] for r in rows] == ["Title 1", "Title 2", "Title 3"]
    finally:
        app.rules[:] = saved_rules
        app.groups.clear()


def test_run_row_ceiling_warns(ray_session, site, monkeypatch):
    """Scraper.run is the dude-parity small-crawl front-end: past
    _ROW_CEILING driver-held rows it must warn and point at the
    streaming run_crawl path (VERDICT_r04 #8)."""
    import dude_ray.scraper as sc

    monkeypatch.setattr(sc, "_ROW_CEILING", 1)
    app = Scraper()
    css_rules(app)
    with pytest.warns(ResourceWarning, match="run_crawl"):
        rows = app.run(urls=[file_url(site / "index.html")])
    assert len(rows) > 1  # the warning fired because rows exceeded 1
