"""Bloom filter — broadcastable approximate membership for semi/anti joins.

The dangling-edge filter broadcasts the node-id set exactly (vocabulary
fits memory).  At corpus scales where even the key set is heavy to ship,
the standard move (Ray guide: "broadcast the key set or a Bloom filter of
it") is a bits-only filter: false positives let a few dangling edges
survive to a cheap exact post-check, false negatives never occur so no true
edge is lost.  numpy bit array, double-hashing scheme h1 + i·h2 (Kirsch &
Mitzenmacher), deterministic (md5-derived hashes).
"""

from __future__ import annotations

import hashlib

import numpy as np


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(1, capacity)
        # standard sizing: m = -n ln p / (ln 2)^2, k = m/n ln 2
        m = int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)) + 1
        self.n_bits = m
        self.n_hashes = max(1, int(round(m / capacity * np.log(2))))
        self.bits = np.zeros((m + 63) // 64, dtype=np.uint64)

    @staticmethod
    def _h1h2(key: str) -> tuple[int, int]:
        d = hashlib.md5(key.encode("utf-8")).digest()
        return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1

    def _positions(self, key: str) -> np.ndarray:
        h1, h2 = self._h1h2(key)
        i = np.arange(self.n_hashes, dtype=np.uint64)
        return (np.uint64(h1) + i * np.uint64(h2)) % np.uint64(self.n_bits)

    def add(self, key: str) -> None:
        pos = self._positions(key)
        # unbuffered |= — duplicate word indices must all apply
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def __contains__(self, key: str) -> bool:
        pos = self._positions(key)
        word = self.bits[pos >> np.uint64(6)]
        mask = np.uint64(1) << (pos & np.uint64(63))
        return bool(np.all(word & mask))

    @classmethod
    def build(cls, keys, fp_rate: float = 0.01) -> "BloomFilter":
        keys = list(keys)
        bf = cls(len(keys), fp_rate)
        for k in keys:
            bf.add(k)
        return bf
