"""Async handler dispatch — the reference runs any coroutine handler
through its event loop (`run_async` flag set at
/root/reference/dude/base.py:183-184, async extraction at
base.py:565-599, exercised by the whole of
/root/reference/tests/test_playwright_async.py).  Here the per-worker
event loop in ``dude_ray.stages.extract`` awaits coroutine results and
drains async generators inside ``map_batches`` workers.
"""

import pytest

import dude_ray
from dude_ray.scraper import Scraper


@pytest.fixture()
def site(tmp_path, dude_html):
    (tmp_path / "index.html").write_text(dude_html)
    return tmp_path


def file_url(p) -> str:
    return f"file://{p}"


def test_async_select_handler(ray_session, site):
    """(/root/reference/tests/test_playwright_async.py select handlers)"""
    app = Scraper()

    @app.select(css=".title", group_css=".custom-group")
    async def title(el):
        return {"title": el.text_content()}

    rows = app.run(urls=[file_url(site / "index.html")])
    assert [r["title"] for r in rows] == ["Title 1", "Title 2", "Title 3"]


def test_async_generator_handler(ray_session, site):
    """Async generators fan out with re-assigned element_index, same as
    sync generators (/root/reference/dude/base.py:577-589)."""
    app = Scraper()

    @app.select(css=".title", group_css=".custom-group")
    async def title(el):
        yield {"title": el.text_content()}
        yield {"title": el.text_content() + "!"}

    rows = app.run(urls=[file_url(site / "index.html")])
    titles = [r["title"] for r in rows]
    assert titles == ["Title 1", "Title 1!", "Title 2", "Title 2!",
                      "Title 3", "Title 3!"]
    # fan-out re-assigns element_index within the group
    assert [r["_element_index"] for r in rows[:2]] == [0, 1]


def test_async_setup_handler_awaited(ray_session, site):
    """Coroutine setup rules are awaited before extraction; their DOM
    mutations are visible to select handlers
    (/root/reference/dude/base.py:505-530).  Handlers run inside Ray
    actors, so the effect is observed through extracted rows, not
    driver-side closures."""
    app = Scraper()

    @app.select(css=".title", setup=True)
    async def mark(el, page):
        el.attrs["data-seen"] = "async"

    @app.select(css=".title", group_css=".custom-group")
    def title(el):
        return {"title": el.text_content(), "seen": el.attrs.get("data-seen")}

    rows = app.run(urls=[file_url(site / "index.html")])
    assert len(rows) == 3
    assert all(r["seen"] == "async" for r in rows)


def test_start_requests_method_body_reach_handlers(ray_session, site):
    """@start_requests POST body is visible to setup handlers via the
    page context (/root/reference/dude/base.py:340-353, asserted in
    /root/reference/tests/test_bs4.py:374-398)."""
    app = Scraper()

    @app.select(css=".title", setup=True)
    async def capture(el, page):
        el.attrs["data-method"] = page.method
        el.attrs["data-body"] = page.body or ""

    @app.select(css=".title", group_css=".custom-group")
    def title(el):
        return {"title": el.text_content(),
                "method": el.attrs.get("data-method"),
                "body": el.attrs.get("data-body")}

    @app.start_requests()
    def reqs():
        yield dude_ray.SeedRequest(
            url=file_url(site / "index.html"), method="POST",
            body='{"q": "dude"}')

    rows = app.run(urls=[])
    assert len(rows) == 3
    assert all(r["method"] == "POST" for r in rows)
    assert all(r["body"] == '{"q": "dude"}' for r in rows)
