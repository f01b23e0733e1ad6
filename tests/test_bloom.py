"""Bloom-filter unit tests (URL-seen set)."""

import hashlib
import random

from dude_ray.state.bloom import BloomFilter


def digests(n, tag=""):
    return [hashlib.sha1(f"{tag}{i}".encode()).digest() for i in range(n)]


def test_no_false_negatives():
    bf = BloomFilter(capacity=10_000)
    keys = digests(5000)
    for k in keys:
        bf.add(k)
    assert all(k in bf for k in keys)
    # count may undercount by the (tiny) false-positive rate during add
    assert 4950 <= bf.count <= 5000


def test_add_reports_duplicates():
    bf = BloomFilter(capacity=1000)
    k = digests(1)[0]
    assert bf.add(k) is False
    assert bf.add(k) is True


def test_false_positive_rate_bounded():
    bf = BloomFilter(capacity=10_000, bits_per_key=10, num_hashes=7)
    for k in digests(10_000, "in"):
        bf.add(k)
    fp = sum(1 for k in digests(10_000, "out") if k in bf)
    # theoretical ~0.8% at 10 bits/key, 7 hashes; allow generous slack
    assert fp / 10_000 < 0.03


def test_checkpoint_roundtrip():
    bf = BloomFilter(capacity=1000)
    keys = digests(500)
    for k in keys:
        bf.add(k)
    raw = bf.to_bytes()
    bf2 = BloomFilter.from_bytes(raw)
    assert bf2.count == bf.count
    assert all(k in bf2 for k in keys)
    out = digests(100, "out")
    assert [k in bf2 for k in out] == [k in bf for k in out]
