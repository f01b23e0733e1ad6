"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture()
def dude_html() -> str:
    """The reference's canonical grouping fixture
    (/root/reference/examples/dude.html): three .custom-group divs with
    .url/.title children, group 2 missing .description, a Next Page
    link and a dead link — re-created here verbatim in structure."""
    return """<!DOCTYPE html>
<html lang="en">
<head>
    <meta charset="UTF-8">
    <title>A simple sandbox for dude</title>
    <link rel="stylesheet" href="https://dude.ron.sh/blockme.css">
</head>
<body>
<div class="custom-group">
    <a class="url" href="url-1.html"><p class="title">Title 1</p></a>
    <p class="description">Description 1</p>
</div>
<div class="custom-group">
    <a class="url" href="url-2.html"><p class="title">Title 2</p></a>
</div>
<div class="custom-group">
    <a class="url" href="url-3.html"><p class="title">Title 3</p></a>
    <p class="description">Description 3</p>
</div>
<div><a href="empty.html">Next Page</a></div>
<div><a href="empty.text">Empty text</a></div>
</body>
</html>
"""


@pytest.fixture()
def base_url() -> str:
    return "https://dwmc.ron.sh"


@pytest.fixture()
def app():
    from dude_ray.spec import DudeApp

    return DudeApp()


@pytest.fixture()
def expected_data(base_url):
    """Golden flattened rows (/root/reference/tests/conftest.py:105-135);
    _group_id here is the deterministic group-selector ordinal."""
    return [
        {"_page_number": 1, "_page_url": base_url, "_group_id": 0,
         "_group_index": 0, "_element_index": 0, "url": "url-1.html", "title": "Title 1"},
        {"_page_number": 1, "_page_url": base_url, "_group_id": 0,
         "_group_index": 1, "_element_index": 0, "url": "url-2.html", "title": "Title 2"},
        {"_page_number": 1, "_page_url": base_url, "_group_id": 0,
         "_group_index": 2, "_element_index": 0, "url": "url-3.html", "title": "Title 3"},
    ]
