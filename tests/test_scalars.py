"""Vectorized scalar URL kernels (SURVEY §2.8)."""

import hashlib

import pyarrow as pa

from dude_ray.functions.scalars import (
    add_url_columns,
    canonicalize_column,
    host_column,
    sha1_column,
    url_match_column,
)


def test_kernels():
    urls = pa.array(["HTTPS://E.com:443/a/../b", "http://x.org/p?q=1#f"])
    canon = canonicalize_column(urls).to_pylist()
    assert canon == ["https://e.com/b", "http://x.org/p?q=1"]
    assert host_column(urls).to_pylist() == ["e.com", "x.org"]
    assert sha1_column(pa.array(canon)).to_pylist()[0] == \
        hashlib.sha1(b"https://e.com/b").digest()
    assert url_match_column(urls, "HTTPS://E.com*").to_pylist() == [True, False]


def test_add_url_columns():
    t = pa.table({"url": ["HTTP://A.b/x/./y", "https://c.d/"]})
    out = add_url_columns(t)
    assert out["canonical_url"].to_pylist() == ["http://a.b/x/y", "https://c.d/"]
    assert out["host"].to_pylist() == ["a.b", "c.d"]
    assert all(len(v) == 20 for v in out["url_sha1"].to_pylist())
