"""URL canonicalization + hashing unit tests."""

import hashlib

from dude_ray.canonical import (
    canonicalize_url,
    host_shard,
    url_host,
    url_sha1,
    url_shard,
)


def test_lowercase_scheme_host():
    assert canonicalize_url("HTTPS://ExAmPlE.CoM/Path") == "https://example.com/Path"


def test_default_port_dropped():
    assert canonicalize_url("https://example.com:443/a") == "https://example.com/a"
    assert canonicalize_url("http://example.com:80/a") == "http://example.com/a"
    assert canonicalize_url("http://example.com:8080/a") == "http://example.com:8080/a"


def test_dot_segments():
    assert canonicalize_url("https://e.com/a/b/../c/./d") == "https://e.com/a/c/d"
    assert canonicalize_url("https://e.com/../../x") == "https://e.com/x"


def test_empty_path_and_fragment():
    assert canonicalize_url("https://e.com") == "https://e.com/"
    assert canonicalize_url("https://e.com/a#frag") == "https://e.com/a"


def test_percent_normalization():
    assert canonicalize_url("https://e.com/%7euser") == "https://e.com/~user"
    assert canonicalize_url("https://e.com/a%20b") == "https://e.com/a%20b"


def test_reserved_escapes_preserved():
    """RFC 3986 §6.2.2: only unreserved escapes decode; %2F in a path and
    %26/%3D in a query are semantically distinct from their literals and
    must survive canonicalization."""
    assert canonicalize_url("https://e.com/a%2Fb") == "https://e.com/a%2Fb"
    assert canonicalize_url("https://e.com/a%2Fb") != canonicalize_url("https://e.com/a/b")
    assert canonicalize_url("https://e.com/p?q=a%26b%3Dc") == "https://e.com/p?q=a%26b%3Dc"
    # escape hex is uppercased; unreserved escapes decode even mixed-case
    assert canonicalize_url("https://e.com/a%2fb%7E") == "https://e.com/a%2Fb~"
    # literal unsafe chars still get encoded
    assert canonicalize_url("https://e.com/a b") == "https://e.com/a%20b"


def test_idempotent():
    u = "HTTPS://E.com:443/a/../b%7E?q=1#f"
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


def test_join_base():
    assert canonicalize_url("url-1.html", base="https://e.com/dir/page.html") == \
        "https://e.com/dir/url-1.html"


def test_fast_path_matches_full():
    """LinkCanonicalizer's string fast path must agree byte-for-byte
    with canonicalize_url(href, base=page) for every href shape — the
    frontier seen-set keys on this equality."""
    from urllib.parse import urljoin

    from dude_ray.canonical import LinkCanonicalizer

    bases = ["https://h0001.test/docs/454.html", "https://e.com/",
             "https://e.com/a/b/", "file:///tmp/site/index.html",
             "http://e.com:8080/x/y.html"]
    hrefs = ["/docs/469.html", "url-1.html", "a/b/c.html", "/", "/a",
             "../up.html", "./here.html", "/a/../b", "a%20b.html",
             "?q=1", "#frag", "https://other.test/x", "HTTPS://E.com/Y",
             "//proto.test/x", "a:b", "/deep/path/with-chars_~!$&'()*+,;=@",
             "x/", "/x/", "mailto:someone@e.com", "a..b.html", "..",
             "a b.html", "/p?x=%26y", "img.png?v=2#top"]
    for base in bases:
        lc = LinkCanonicalizer(base)
        for href in hrefs:
            assert lc(href) == canonicalize_url(href, base=base), (base, href)
            # and the full path agrees with join-then-canonicalize
            assert canonicalize_url(href, base=base) == \
                canonicalize_url(urljoin(base, href)), (base, href)


def test_sha1_and_shards():
    u = "https://example.com/"
    assert url_sha1(u) == hashlib.sha1(u.encode()).digest()
    assert 0 <= url_shard(u, 16) < 16
    assert 0 <= host_shard("example.com", 16) < 16
    assert url_host("https://Example.COM:8443/x") == "example.com"


def test_canonical_url_host_matches_url_host():
    from dude_ray.canonical import canonical_url_host

    urls = ["https://h0001.test/docs/1.html", "http://e.com:8080/x",
            "https://user:pw@e.com/x", "file:///tmp/x/index.html",
            "https://e.com/", "https://e.com"]
    for u in urls:
        c = canonicalize_url(u)
        assert canonical_url_host(c) == url_host(c), c


def test_stray_percent_encoded():
    """A literal '%' not starting a valid escape is itself %25-encoded
    (RFC-valid output); valid escapes are untouched; idempotent."""
    from dude_ray.canonical import canonicalize_url

    u = canonicalize_url("http://x.com/100%off?q=50%")
    assert u == "http://x.com/100%25off?q=50%25"
    assert canonicalize_url(u) == u
    # valid escape preserved (reserved) / decoded (unreserved), as before
    assert canonicalize_url("http://x.com/a%2Fb%41") == "http://x.com/a%2FbA"
    # '%2' (one hex digit) is stray too
    assert canonicalize_url("http://x.com/a%2") == "http://x.com/a%252"
