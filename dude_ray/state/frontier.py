"""Frontier shard actors — the stateful core of the crawl engine.

The reference's frontier is a process-local FIFO deque with no seen
set, no politeness structure and a robots re-fetch per URL
(/root/reference/dude/base.py:75,361-391).  Here it is a pool of
host-hash-sharded Ray actors; each shard single-owns the hosts in its
hash range, so per-host politeness decisions never need coordination
(SURVEY §7 hard part 2).  Per shard:

* Bloom URL-seen filter keyed SHA-1(canonical URL) (+ an exact confirm
  set at test scale so tests can assert zero false positives);
* per-host FIFO queues ordered by a deterministic *enqueue key*;
* a per-host memoized robots gate (``urllib.robotparser``, user-agent
  "dude" — /root/reference/dude/base.py:378-391 — parsed once from the
  corpus robots table, fixing the reference's re-fetch TODO at
  base.py:382);
* the allowed-domains semi-join (seed netlocs only,
  /root/reference/dude/base.py:364-367,405);
* a virtual-clock politeness budget (one tick per ``release`` call; a
  host with robots ``Crawl-delay: d`` releases at most one URL every
  ``d`` ticks);
* checkpoint/restore (Bloom bytes + queues + counters).

Determinism / reference-equivalence design.  Every offered URL carries
an **enqueue key** ``(round, parent_order, link_index)`` — the global
position of its discovering page within its round and the link's
document-order index on that page (seeds: ``(-1, seed_index, 0)``).
Offers are buffered and applied in key-sorted order at the next
release, and release pops the globally smallest key among
politeness-eligible hosts.  Because the sequential reference loop pops
FIFO and appends each page's links in document order
(/root/reference/dude/base.py:361-376 + beautifulsoup_scraper.py:81-85),
its queue order is exactly "sorted by (parent visit position, link
index)" — so with politeness deferral disabled, the engine's visit
sequence ordered by enqueue key equals the reference replay's visit
sequence *globally*, and with deferral enabled the first-visit SET is
unchanged (gates are per-URL and static) while per-host FIFO order is
preserved.  Tests assert both (tests/test_crawl.py).

Scale notes: hosts are single-owner, so a hot host bounds only its own
throughput (its crawl delay serializes it anyway).  Edges reach shards
directly from extract workers (actor handle calls): the edge shuffle
is an explicit hash exchange keyed on host-hash, never routed through
the driver.
"""

from __future__ import annotations

import collections
import heapq
import io
import pickle
from typing import Optional
from urllib.robotparser import RobotFileParser

import ray

from ..canonical import url_host, url_sha1
from .bloom import BloomFilter

USER_AGENT = "dude"  # the reference's literal UA (/root/reference/dude/base.py:381)

SKIP_DOMAIN = "not_allowed_domain"
SKIP_ROBOTS = "robots_disallowed"
SKIP_DUP = "duplicate"

Key = tuple  # (round, parent_order, link_index)


class _HostState:
    __slots__ = ("queue", "next_free_tick", "crawl_delay", "released")

    def __init__(self, crawl_delay: int):
        self.queue: collections.deque = collections.deque()  # (key, url, depth)
        self.next_free_tick = 0
        self.crawl_delay = crawl_delay
        self.released = 0


class FrontierShardLocal:
    """Shard logic, actor-free (unit tests use it directly; the Ray
    actor below is a thin wrapper)."""

    def __init__(
        self,
        shard_id: int,
        robots_map: dict[str, str],
        allowed_domains: set[str],
        capacity: int = 1_000_000,
        exact_confirm: bool = True,
        ignore_robots_txt: bool = False,
        politeness: bool = True,
    ):
        self.shard_id = shard_id
        self.bloom = BloomFilter(capacity=capacity)
        self.exact: Optional[set] = set() if exact_confirm else None
        self.hosts: dict[str, _HostState] = {}
        self.robots_raw = robots_map
        self._robots_cache: dict[str, RobotFileParser] = {}
        self.allowed_domains = set(allowed_domains)
        self.ignore_robots_txt = ignore_robots_txt
        self.politeness = politeness
        self.tick = 0
        self._buffer: list[tuple[Key, str, int]] = []
        self.stats = collections.Counter()

    # ---- robots (memoized per host) -----------------------------------
    def _robots(self, host: str) -> RobotFileParser:
        p = self._robots_cache.get(host)
        if p is None:
            p = RobotFileParser()
            p.parse((self.robots_raw.get(host) or "").splitlines())
            self._robots_cache[host] = p
        return p

    def can_fetch_and_delay(self, host: str, url: str) -> tuple[bool, int]:
        if self.ignore_robots_txt:
            return True, 0
        p = self._robots(host)
        delay = p.crawl_delay(USER_AGENT) or 0
        return p.can_fetch(USER_AGENT, url), int(delay)

    # ---- offer (buffered) ---------------------------------------------
    def offer(self, urls: list[str], depths: list[int], keys: list[Key]) -> int:
        """Buffer offered edges; gates/dedup apply at the next release in
        deterministic key order.  Returns number buffered."""
        self._buffer.extend(zip(keys, urls, depths))
        return len(self._buffer)

    def _apply_buffer(self) -> None:
        """Gate precedence mirrors the reference pop loop: allowed-domains
        (/root/reference/dude/base.py:364-367) → seen-set (our mandated
        addition) → robots (/root/reference/dude/base.py:368-371)."""
        self._buffer.sort(key=lambda t: t[0])
        c = self.stats
        for key, url, depth in self._buffer:
            c["offered"] += 1
            host = url_host(url)
            if host not in self.allowed_domains:
                c[SKIP_DOMAIN] += 1
                continue
            digest = url_sha1(url)
            if self.exact is not None:
                dup = digest in self.exact
                if not dup:
                    self.exact.add(digest)
                self.bloom.add(digest)
            else:
                dup = self.bloom.add(digest)
            if dup:
                c[SKIP_DUP] += 1
                continue
            can, delay = self.can_fetch_and_delay(host, url)
            if not can:
                c[SKIP_ROBOTS] += 1
                continue
            hs = self.hosts.get(host)
            if hs is None:
                hs = self.hosts[host] = _HostState(delay)
            hs.queue.append((key, url, depth))
            c["enqueued"] += 1
        self._buffer.clear()

    # ---- release (politeness budget, one tick per call) ----------------
    def release(self, max_urls: int = 1_000_000) -> list[tuple[Key, str, int]]:
        """Pop up to ``max_urls`` politeness-eligible entries in global
        key order; advances the virtual clock one tick."""
        self._apply_buffer()
        self.tick += 1
        out: list[tuple[Key, str, int]] = []
        # heap of (head_key, host) over eligible nonempty hosts
        heap: list[tuple[Key, str]] = []
        for host, hs in self.hosts.items():
            if hs.queue and (not self.politeness or hs.crawl_delay == 0
                             or self.tick >= hs.next_free_tick):
                heap.append((hs.queue[0][0], host))
        heapq.heapify(heap)
        while heap and len(out) < max_urls:
            _, host = heapq.heappop(heap)
            hs = self.hosts[host]
            item = hs.queue.popleft()
            out.append(item)
            hs.released += 1
            if self.politeness and hs.crawl_delay > 0:
                hs.next_free_tick = self.tick + hs.crawl_delay
                continue  # host throttled for this tick
            if hs.queue:
                heapq.heappush(heap, (hs.queue[0][0], host))
        self.stats["released"] += len(out)
        return out

    # ---- introspection --------------------------------------------------
    def pending(self) -> int:
        return sum(len(h.queue) for h in self.hosts.values()) + len(self._buffer)

    def seen_count(self) -> int:
        return len(self.exact) if self.exact is not None else self.bloom.count

    def has_seen(self, url: str) -> bool:
        d = url_sha1(url)
        return (d in self.exact) if self.exact is not None else (d in self.bloom)

    def seen_urls_sha1(self) -> list[bytes]:
        """Exact seen digests (test-scale only)."""
        assert self.exact is not None
        return sorted(self.exact)

    def get_stats(self) -> dict:
        s = dict(self.stats)
        s["pending"] = self.pending()
        s["seen"] = self.seen_count()
        s["shard_id"] = self.shard_id
        return s

    def host_accounting(self) -> list[dict]:
        """Per-host politeness accounting rows (SURVEY A3)."""
        return [
            {"host": h, "released": hs.released, "pending": len(hs.queue),
             "crawl_delay": hs.crawl_delay, "shard_id": self.shard_id}
            for h, hs in sorted(self.hosts.items())
        ]

    # ---- checkpoint ------------------------------------------------------
    def snapshot(self) -> bytes:
        buf = io.BytesIO()
        pickle.dump({
            "shard_id": self.shard_id,
            "bloom": self.bloom.to_bytes(),
            "exact": self.exact,
            "hosts": {h: (list(hs.queue), hs.next_free_tick, hs.crawl_delay, hs.released)
                      for h, hs in self.hosts.items()},
            "tick": self.tick,
            "buffer": self._buffer,
            "stats": self.stats,
            "allowed_domains": self.allowed_domains,
            "ignore_robots_txt": self.ignore_robots_txt,
            "politeness": self.politeness,
        }, buf)
        return buf.getvalue()

    def restore(self, raw: bytes) -> None:
        d = pickle.loads(raw)
        self.shard_id = d["shard_id"]
        self.bloom = BloomFilter.from_bytes(d["bloom"])
        self.exact = d["exact"]
        self.hosts = {}
        for h, (q, nft, delay, released) in d["hosts"].items():
            hs = _HostState(delay)
            hs.queue = collections.deque(q)
            hs.next_free_tick = nft
            hs.released = released
            self.hosts[h] = hs
        self.tick = d["tick"]
        self._buffer = d["buffer"]
        self.stats = d["stats"]
        self.allowed_domains = d["allowed_domains"]
        self.ignore_robots_txt = d["ignore_robots_txt"]
        self.politeness = d["politeness"]


@ray.remote
class FrontierShard(FrontierShardLocal):
    """Ray actor wrapper — state lives in the actor's heap; extract
    workers call ``offer`` directly (hash-partitioned edge exchange)."""
    pass
