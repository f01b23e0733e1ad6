"""Scalar URL/text functions as vectorized batch kernels (SURVEY §2.8).

The reference's scalar vocabulary (`urljoin` absolutization,
`urlparse().netloc`, trailing-slash compare, fnmatch URL globs —
/root/reference/dude/playwright_scraper.py:184, base.py:365,405,
rule.py:83) plus this engine's canonicalizer/hash, packaged as
column-in/column-out kernels for use inside ``map_batches``.
"""

from __future__ import annotations

from fnmatch import fnmatch

import pyarrow as pa

from ..canonical import canonicalize_url, url_host, url_sha1


def canonicalize_column(urls: pa.Array, base: str | None = None) -> pa.Array:
    return pa.array([canonicalize_url(u, base=base) for u in urls.to_pylist()],
                    type=pa.string())


def host_column(urls: pa.Array) -> pa.Array:
    return pa.array([url_host(u) for u in urls.to_pylist()], type=pa.string())


def sha1_column(urls: pa.Array) -> pa.Array:
    return pa.array([url_sha1(u) for u in urls.to_pylist()],
                    type=pa.binary(20))


def url_match_column(urls: pa.Array, pattern: str) -> pa.Array:
    """fnmatch URL glob as a vectorized predicate
    (/root/reference/dude/rule.py:83)."""
    return pa.array([fnmatch(u, pattern) for u in urls.to_pylist()],
                    type=pa.bool_())


def add_url_columns(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Convenience: append canonical/host/sha1 columns in one pass."""
    urls = [canonicalize_url(u) for u in batch[url_col].to_pylist()]
    return (batch
            .append_column("canonical_url", pa.array(urls, type=pa.string()))
            .append_column("host", pa.array([url_host(u) for u in urls],
                                            type=pa.string()))
            .append_column("url_sha1", pa.array([url_sha1(u) for u in urls],
                                                type=pa.binary(20))))
