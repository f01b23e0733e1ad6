"""Sequential in-memory oracle — replays the reference's crawl loop.

This is the ground truth for crawl-equivalence tests: a direct
re-implementation of ``iter_urls`` semantics
(/root/reference/dude/base.py:361-376 — FIFO pop, allowed-domains
filter, robots gate with user-agent "dude", crawl-delay accounting)
plus the follow-urls link append in document order
(/root/reference/dude/optional/beautifulsoup_scraper.py:81-85), with
the engine's mandated additions applied identically: RFC 3986
canonicalization and first-offer URL dedup (the reference has no seen
set — SURVEY §1.4 — so equivalence is defined on first visits).

Runs entirely on the driver over a dict corpus index; only usable at
test scale by design.
"""

from __future__ import annotations

import collections
from dataclasses import dataclass, field
from typing import Optional
from urllib.robotparser import RobotFileParser

from .canonical import canonicalize_url, url_host, url_sha1
from .htmlparser import parse_html
from .stages.links import collect_links

USER_AGENT = "dude"


@dataclass
class OracleResult:
    visits: list[dict] = field(default_factory=list)       # visit order, fields: url, host, status, depth
    seen: set = field(default_factory=set)                  # sha1 digests (dup-checked URLs)
    skips: collections.Counter = field(default_factory=collections.Counter)
    skipped_urls: dict = field(default_factory=dict)        # url -> reason

    def visit_urls(self) -> list[str]:
        return [v["url"] for v in self.visits]

    def per_host_order(self) -> dict[str, list[str]]:
        out: dict[str, list[str]] = collections.defaultdict(list)
        for v in self.visits:
            out[v["host"]].append(v["url"])
        return dict(out)


def sequential_crawl(
    corpus_index: dict[str, str],
    robots_map: dict[str, str],
    seeds: list[str],
    ignore_robots_txt: bool = False,
    follow_urls: bool = True,
) -> OracleResult:
    """BFS replay. Gate precedence matches the engine's offer path:
    domain → dedup → robots (robots-blocked URLs count as seen, as the
    engine's bloom.add happens before its robots check)."""
    res = OracleResult()
    queue: collections.deque = collections.deque(
        (canonicalize_url(u), 0) for u in seeds)
    allowed = {url_host(u) for u, _ in queue}
    robots_cache: dict[str, RobotFileParser] = {}

    def robots(host: str) -> RobotFileParser:
        p = robots_cache.get(host)
        if p is None:
            p = RobotFileParser()
            p.parse((robots_map.get(host) or "").splitlines())
            robots_cache[host] = p
        return p

    while queue:
        url, depth = queue.popleft()
        host = url_host(url)
        if host not in allowed:
            res.skips["not_allowed_domain"] += 1
            res.skipped_urls.setdefault(url, "not_allowed_domain")
            continue
        digest = url_sha1(url)
        if digest in res.seen:
            res.skips["duplicate"] += 1
            continue
        res.seen.add(digest)
        if not ignore_robots_txt:
            p = robots(host)
            if not p.can_fetch(USER_AGENT, url):
                res.skips["robots_disallowed"] += 1
                res.skipped_urls.setdefault(url, "robots_disallowed")
                continue
        html = corpus_index.get(url)
        if html is None:
            res.visits.append({"url": url, "host": host, "status": "missing",
                               "depth": depth})
            continue
        res.visits.append({"url": url, "host": host, "status": "ok",
                           "depth": depth})
        if follow_urls:
            for link in collect_links(parse_html(html), url):
                queue.append((link, depth + 1))
    return res


def load_corpus_index(corpus_dir: str) -> dict[str, str]:
    """url → html for the whole corpus (test scale only)."""
    import pyarrow.dataset as pads

    t = pads.dataset(f"{corpus_dir}/web", partitioning="hive").to_table(
        columns=["doc_id", "html"])
    return dict(zip(t["doc_id"].to_pylist(), t["html"].to_pylist()))


def crawl_host_counts_oracle_sql(sf_dir: Optional[str] = None) -> str:
    """DuckDB oracle for ``__ray_entry__``'s ``crawl_host_counts``:
    the sequential crawl replay (this module — the reference's
    ``iter_urls`` loop) produces the ground-truth visit list, the
    per-visit (host, n_links) rows are inlined as VALUES, and the
    per-host page/link aggregation is recomputed independently in SQL.
    Valid because the engine's first-visit SET equals the oracle's
    regardless of politeness scheduling (asserted by
    tests/test_crawl.py::test_first_visit_set_equals_oracle) and
    n_links is a pure function of the page
    (``len(collect_links(...))``, the engine's exact expression —
    dude_ray/crawl.py:215).  Runs the replay at oracle-gate scale
    only."""
    import os

    from .sources.corpus import ensure_corpus, load_robots, load_seeds

    sf_dir = sf_dir or os.environ.get("GRAFT_ORACLE_SF",
                                      "/root/testdata/sf0.01")
    corpus_dir = ensure_corpus(sf_dir)
    index = load_corpus_index(corpus_dir)
    robots = load_robots(corpus_dir)
    seeds = [s["url"] for s in load_seeds(corpus_dir)]
    res = sequential_crawl(index, robots, seeds)
    rows = []
    for v in res.visits:
        if v["status"] == "ok":
            nl = len(collect_links(parse_html(index[v["url"]]),
                                   v["url"]))
        else:
            nl = 0
        rows.append((v["host"], nl))
    if not rows:
        raise ValueError("empty oracle crawl")
    vals = ",".join(f"('{h}',{n})" for h, n in rows)
    return f"""
        WITH visits(host, n_links) AS (VALUES {vals})
        SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
               CAST(sum(n_links) AS BIGINT) AS n_links
        FROM visits GROUP BY host
    """


def crawl_skip_counts_oracle_sql(sf_dir: Optional[str] = None) -> str:
    """DuckDB oracle for ``__ray_entry__``'s ``crawl_skip_counts``:
    the sequential replay's per-URL skip reasons are inlined as VALUES
    (one row per skipped URL) plus one 'released' row per visit, and
    the reason aggregation is recomputed in SQL.  The engine's shard
    counters match the replay's Counter by the pytest contract
    (tests/test_crawl.py::test_skip_counters_match_oracle); this makes
    that equality driver-recordable."""
    import os

    from .sources.corpus import ensure_corpus, load_robots, load_seeds

    sf_dir = sf_dir or os.environ.get("GRAFT_ORACLE_SF",
                                      "/root/testdata/sf0.01")
    corpus_dir = ensure_corpus(sf_dir)
    index = load_corpus_index(corpus_dir)
    robots = load_robots(corpus_dir)
    seeds = [s["url"] for s in load_seeds(corpus_dir)]
    res = sequential_crawl(index, robots, seeds)
    rows: list[str] = []
    for reason, n in sorted(res.skips.items()):
        rows += [reason] * n
    rows += ["released"] * len(res.visits)
    if not rows:
        raise ValueError("empty oracle crawl")
    vals = ",".join(f"('{r}')" for r in rows)
    return f"""
        WITH ev(reason) AS (VALUES {vals})
        SELECT reason, CAST(count(*) AS BIGINT) AS n
        FROM ev GROUP BY reason ORDER BY reason
    """
