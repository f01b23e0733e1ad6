"""Bloom filter for the URL-seen set (approximate membership).

The reference has NO url-seen set at all — its frontier can revisit
pages (``/root/reference/dude/base.py:361-376`` pops a plain deque).
The north rule mandates a Bloom/cuckoo seen filter keyed on
SHA-1(canonical URL), sharded across the frontier actor pool.

Design notes for 10^10-URL scale: each frontier shard owns one filter
over its key range.  With S shards, per-shard capacity n = 1e10 / S;
at 10 bits/key a 256-shard deployment needs ~4.7 GB per shard — held
in the actor's heap as a numpy bit array, snapshot via ``tobytes()``
into the checkpoint.  k (=7 here) hash probes are derived from the
single SHA-1 digest (Kirsch-Mitzenmacher double hashing), so no extra
hashing beyond the canonical url_sha1 already computed upstream.

At test scale an exact ``set`` confirm layer is kept alongside so
tests can assert zero false positives; production mode would drop it.
"""

from __future__ import annotations

import numpy as np


class BloomFilter:
    """Fixed-size Bloom filter over 20-byte SHA-1 digests."""

    def __init__(self, capacity: int, bits_per_key: int = 10, num_hashes: int = 7):
        self.capacity = int(capacity)
        self.num_bits = max(64, int(capacity) * bits_per_key)
        self.num_hashes = num_hashes
        self.bits = np.zeros((self.num_bits + 7) // 8, dtype=np.uint8)
        self.count = 0

    def _probes(self, digest: bytes) -> np.ndarray:
        # Kirsch-Mitzenmacher: g_i = h1 + i*h2 mod m, from one SHA-1
        h1 = int.from_bytes(digest[:8], "big")
        h2 = int.from_bytes(digest[8:16], "big") | 1
        i = np.arange(self.num_hashes, dtype=np.uint64)
        return (np.uint64(h1) + i * np.uint64(h2)) % np.uint64(self.num_bits)

    def add(self, digest: bytes) -> bool:
        """Insert; returns True if the key was (probably) already present."""
        pos = self._probes(digest)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        masks = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)).astype(np.uint8)
        present = bool(np.all(self.bits[byte_idx] & masks))
        if not present:
            np.bitwise_or.at(self.bits, byte_idx, masks)
            self.count += 1
        return present

    def __contains__(self, digest: bytes) -> bool:
        pos = self._probes(digest)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        masks = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)).astype(np.uint8)
        return bool(np.all(self.bits[byte_idx] & masks))

    # ---- batch path ---------------------------------------------------------
    def add_many(self, digests: list[bytes]) -> np.ndarray:
        """Vectorized insert of N digests at once; returns the PRE-insert
        (probable) membership flags.  The per-key ``add`` pays ~10µs of
        numpy dispatch overhead per call — at frontier offer rates the
        batch path is the difference between the seen-set being free and
        it dominating shard time."""
        n = len(digests)
        if n == 0:
            return np.zeros(0, dtype=bool)
        raw = np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(n, -1)
        h1 = raw[:, :8].copy().view(">u8").ravel().astype(np.uint64)
        h2 = (raw[:, 8:16].copy().view(">u8").ravel().astype(np.uint64)
              | np.uint64(1))
        i = np.arange(self.num_hashes, dtype=np.uint64)[None, :]
        pos = (h1[:, None] + i * h2[:, None]) % np.uint64(self.num_bits)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        masks = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)).astype(np.uint8)
        present = ((self.bits[byte_idx] & masks) == masks).all(axis=1)
        np.bitwise_or.at(self.bits, byte_idx.ravel(), masks.ravel())
        self.count += int((~present).sum())
        return present

    def contains_many(self, digests: list[bytes]) -> np.ndarray:
        """Vectorized membership probe (no insert) of N digests."""
        n = len(digests)
        if n == 0:
            return np.zeros(0, dtype=bool)
        raw = np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(n, -1)
        h1 = raw[:, :8].copy().view(">u8").ravel().astype(np.uint64)
        h2 = (raw[:, 8:16].copy().view(">u8").ravel().astype(np.uint64)
              | np.uint64(1))
        i = np.arange(self.num_hashes, dtype=np.uint64)[None, :]
        pos = (h1[:, None] + i * h2[:, None]) % np.uint64(self.num_bits)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        masks = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)).astype(np.uint8)
        return ((self.bits[byte_idx] & masks) == masks).all(axis=1)

    # ---- checkpoint support -------------------------------------------------
    def to_bytes(self) -> bytes:
        header = np.array([self.num_bits, self.num_hashes, self.count], dtype=np.int64)
        return header.tobytes() + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "BloomFilter":
        num_bits, num_hashes, count = np.frombuffer(raw[:24], dtype=np.int64)
        bf = cls.__new__(cls)
        bf.capacity = int(num_bits) // 10
        bf.num_bits = int(num_bits)
        bf.num_hashes = int(num_hashes)
        bf.count = int(count)
        bf.bits = np.frombuffer(raw[24:], dtype=np.uint8).copy()
        return bf
