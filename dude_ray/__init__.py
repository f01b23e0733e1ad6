"""dude_ray — a Ray-Data-native distributed crawl/extract engine with
the query and data-processing capabilities of ``roniemartinez/dude``
(reference read-only at /root/reference), rebuilt from scratch on
``ray.data.Dataset`` pipelines:

* selector extraction = stateless ``map_batches`` over zero-copy Arrow
  batches of interleaved text+media documents;
* the URL frontier = a sharded actor pool with a Bloom URL-seen set
  (SHA-1 over RFC 3986-canonical URLs) and per-host politeness heaps;
* wide steps (edge routing, politeness accounting) = explicit
  hash-partitioned exchanges keyed on host-hash;
* sinks = streaming partitioned parquet with a resume manifest.

Module-level decorator API mirroring the reference's
(/root/reference/dude/__init__.py:29-42):

    import dude_ray as dude

    @dude.select(css=".title")
    def title(el):
        return {"title": el.text_content()}
"""

from .canonical import canonicalize_url, url_host, url_sha1
from .rule import Rule, Selector, SelectorType
from .scraped import ScrapedData
from .scraper import Scraper, follow_url, get_current_url
from .spec import DudeApp, PipelineSpec, SeedRequest

__version__ = "0.1.0"

_app = Scraper()

# module-level singleton decorators + run (reference:
# /root/reference/dude/context.py:7-18 — its singleton is a Scraper so
# `dude.run(urls=…)` works at module level; same here)
select = _app.select
group = _app.group
save = _app.save
startup = _app.startup
pre_setup = _app.pre_setup
post_setup = _app.post_setup
shutdown = _app.shutdown
start_requests = _app.start_requests
run = _app.run


def default_app() -> DudeApp:
    return _app


__all__ = [
    "DudeApp", "PipelineSpec", "Rule", "ScrapedData", "Scraper", "SeedRequest",
    "Selector", "SelectorType", "canonicalize_url", "default_app", "follow_url",
    "get_current_url", "group", "post_setup", "pre_setup", "run", "save",
    "select", "shutdown", "start_requests", "startup", "url_host", "url_sha1",
]
