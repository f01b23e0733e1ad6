"""Fetch stage — URL → document lookup into the corpus (J1).

The reference's fetch is ``page.goto(url)`` / ``httpx`` GET with
error→skip (/root/reference/dude/playwright_scraper.py:169-203,
/root/reference/dude/optional/utils.py:11-28).  In corpus-replay mode
a fetch is a key lookup into the partitioned corpus parquet: partition
``part = host_shard(host, P)`` is the same hash family the frontier
uses, so one released batch clusters into few partitions and a worker
only reads the row groups of the partitions it actually serves.

Stateful → actor pool: the partition cache lives in the actor across
batches (LRU-bounded for the 100 TB case where one worker cannot hold
the corpus; at test scale everything fits)."""

from __future__ import annotations

import collections
from typing import Optional

import pyarrow.dataset as pads

from ..canonical import host_shard, url_host


class CorpusFetcher:
    """Holds the partitioned corpus; ``lookup`` resolves canonical URLs
    to (html, found) pairs."""

    def __init__(self, corpus_dir: str, num_parts: int, cache_parts: int = 64):
        self._dataset = pads.dataset(f"{corpus_dir}/web", partitioning="hive")
        self.num_parts = num_parts
        self._cache: "collections.OrderedDict[int, dict[str, str]]" = collections.OrderedDict()
        self._cache_parts = cache_parts

    def _part_index(self, part: int) -> dict[str, str]:
        idx = self._cache.get(part)
        if idx is None:
            t = self._dataset.to_table(columns=["doc_id", "html"],
                                       filter=pads.field("part") == part)
            idx = dict(zip(t["doc_id"].to_pylist(), t["html"].to_pylist()))
            self._cache[part] = idx
            if len(self._cache) > self._cache_parts:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(part)
        return idx

    def lookup(self, urls: list[str]) -> list[Optional[str]]:
        out: list[Optional[str]] = []
        for url in urls:
            part = host_shard(url_host(url), self.num_parts)
            out.append(self._part_index(part).get(url))
        return out
