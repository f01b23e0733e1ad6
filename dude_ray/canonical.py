"""RFC 3986 URL canonicalization + SHA-1 URL hashing.

The reference normalizes URLs only weakly — ``urljoin`` plus a
trailing-slash strip when comparing a link against the current page
(``/root/reference/dude/playwright_scraper.py:184-185``).  Per the
north rule this engine canonicalizes properly before hashing into the
URL-seen set: lowercase scheme/host, drop default ports, resolve dot
segments, normalize percent-encoding of unreserved characters, drop
fragments, and collapse empty paths to "/".

All functions are pure and vectorization-friendly (applied per batch
inside ``map_batches``; the per-URL work is string parsing, so a tight
Python loop over a batch column is the practical kernel).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import quote, urljoin, urlparse, urlunparse

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}

# RFC 3986 unreserved characters: ALPHA / DIGIT / "-" / "." / "_" / "~"
_SAFE = "-._~!$&'()*+,;=:@/"

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_STRAY_PCT_RE = re.compile(r"%(?![0-9A-Fa-f]{2})")


def _norm_pct(s: str) -> str:
    """RFC 3986 §6.2.2.1-.2: decode ONLY unreserved-character escapes,
    uppercase the hex of every other escape.  Reserved escapes (%2F in a
    path, %26/%3D in a query value) stay encoded — decoding them would
    collapse distinct URLs onto one canonical form.  A literal '%' not
    starting a valid escape (e.g. '/100%off') is itself encoded as %25
    so the output is always RFC-valid ('%' is in the quote safe set)."""
    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    if "%" in s:
        s = _STRAY_PCT_RE.sub("%25", s)
        s = _PCT_RE.sub(repl, s)
    return s


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(output) > 1:
                output.pop()
            continue
        output.append(seg)
    # re-add trailing slash semantics for "." / ".." enders
    if path.endswith(("/.", "/..")) and output and output[-1] != "":
        output.append("")
    return "/".join(output)


def canonicalize_url(url: str, base: str | None = None) -> str:
    """Canonical form of ``url`` (optionally joined against ``base``).

    Deterministic, idempotent: ``canonicalize_url(canonicalize_url(u))
    == canonicalize_url(u)``.
    """
    if base:
        url = urljoin(base, url)
    parts = urlparse(url.strip())
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = _remove_dot_segments(parts.path) or "/"
    # normalize percent-encoding per escape triplet (keeps reserved
    # escapes intact), then encode any literal chars that need it; '%'
    # is safe so existing escapes aren't double-encoded
    path = quote(_norm_pct(path), safe=_SAFE + "%")
    query = quote(_norm_pct(parts.query), safe=_SAFE + "%?&=")
    return urlunparse((scheme, netloc, path, parts.params, query, ""))


# Fast-path link canonicalization: the overwhelmingly common hrefs on
# real pages are plain relative or site-absolute paths of safe
# characters with no dot segments, queries, fragments or escapes.  For
# those, canonicalize_url(urljoin(base, href)) reduces to string
# concatenation against a once-per-page parsed base.  Anything else
# falls back to the full canonicalizer; equality of the two paths is
# asserted by tests/test_canonical.py::test_fast_path_matches_full.
_SIMPLE_ABS = re.compile(r"^/[A-Za-z0-9\-._~!$&'()*+,;=:@/]*$")
# ':' excluded everywhere in the relative form — 'a:b' would parse as a
# scheme, and ':' after the first '/' is rare enough for the slow path
_SIMPLE_REL = re.compile(r"^[A-Za-z0-9\-._~!$&'()*+,;=@/]+$")
_DOTSEG = re.compile(r"(?:^|/)\.\.?(?:/|$)")


class LinkCanonicalizer:
    """Per-page canonicalizer: parses the (already canonical) page URL
    once, then canonicalizes each href with a string fast path."""

    __slots__ = ("base", "prefix", "dir_prefix")

    def __init__(self, page_url: str):
        self.base = page_url
        p = urlparse(page_url)
        self.prefix = f"{p.scheme}://{p.netloc}"
        path = p.path or "/"
        self.dir_prefix = self.prefix + path[:path.rfind("/") + 1]

    def __call__(self, href: str) -> str:
        if href.startswith("/"):
            if not href.startswith("//") and _SIMPLE_ABS.match(href) \
                    and not _DOTSEG.search(href):
                return self.prefix + href
        elif _SIMPLE_REL.match(href) and not _DOTSEG.search(href):
            return self.dir_prefix + href
        return canonicalize_url(href, base=self.base)


def url_sha1(url: str) -> bytes:
    """20-byte SHA-1 digest of the canonical URL — the seen-set key."""
    return hashlib.sha1(url.encode("utf-8")).digest()


def url_host(url: str) -> str:
    """Politeness / shuffle key: lowercase netloc host."""
    h = urlparse(url).hostname
    return h.lower() if h else ""


def canonical_url_host(url: str) -> str:
    """``url_host`` for URLs ALREADY in canonical form (scheme and host
    lowercased by ``canonicalize_url``): plain string slicing instead
    of a full urlparse — this runs once per discovered edge in the
    crawl's hottest loop.  Equality with ``url_host`` on canonical
    input is asserted by tests/test_canonical.py."""
    i = url.find("//")
    if i < 0:
        return ""
    j = url.find("/", i + 2)
    netloc = url[i + 2:] if j < 0 else url[i + 2:j]
    at = netloc.rfind("@")
    if at >= 0:
        netloc = netloc[at + 1:]
    colon = netloc.rfind(":")
    if colon >= 0 and netloc.find("]", colon) < 0:  # not inside [v6]
        netloc = netloc[:colon]
    return netloc


def url_shard(url: str, num_shards: int) -> int:
    """Frontier shard id: first 8 bytes of SHA-1(canonical url) mod shards.

    Uniform over URLs (seen-set balance); politeness is still per-host
    because each shard keys its queues by host internally.
    """
    return int.from_bytes(url_sha1(url)[:8], "big") % num_shards


def host_shard(host: str, num_shards: int) -> int:
    """Host-affine shard id — used when per-host state must be single-owner."""
    d = hashlib.sha1(host.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big") % num_shards
