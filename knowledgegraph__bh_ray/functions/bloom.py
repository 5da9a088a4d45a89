"""Bloom filter — broadcastable approximate membership for semi/anti joins.

The dangling-edge filter broadcasts the node-id set exactly (vocabulary
fits memory).  At corpus scales where even the key set is heavy to ship,
the standard move (Ray guide: "broadcast the key set or a Bloom filter of
it") is a bits-only filter: false positives let a few dangling edges
survive to a cheap exact post-check, false negatives never occur so no true
edge is lost.  numpy bit array, double-hashing scheme h1 + i·h2 (Kirsch &
Mitzenmacher).

Everything is ARRAY-at-a-time: hashing runs through ``pd.util.hash_array``
(C siphash over the whole key array, fixed hash keys → deterministic across
processes), position math and bit tests are one numpy broadcast over
(n_keys × n_hashes) — no per-row Python on the scale path this filter
exists for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# pandas hash_array keys must be exactly 16 bytes
_HK1 = "kgbh.bloom.h1.ky"
_HK2 = "kgbh.bloom.h2.ky"


def _h1h2_many(keys) -> tuple[np.ndarray, np.ndarray]:
    arr = np.asarray(keys, dtype=object)
    h1 = pd.util.hash_array(arr, hash_key=_HK1).astype(np.uint64)
    h2 = (pd.util.hash_array(arr, hash_key=_HK2).astype(np.uint64)) | np.uint64(1)
    return h1, h2


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(1, capacity)
        # standard sizing: m = -n ln p / (ln 2)^2, k = m/n ln 2
        m = int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)) + 1
        self.n_bits = m
        self.n_hashes = max(1, int(round(m / capacity * np.log(2))))
        self.bits = np.zeros((m + 63) // 64, dtype=np.uint64)

    def _positions_many(self, keys) -> np.ndarray:
        """(n_keys, n_hashes) bit positions, fully vectorized."""
        h1, h2 = _h1h2_many(keys)
        i = np.arange(self.n_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.n_bits)

    def add_many(self, keys) -> None:
        pos = self._positions_many(keys).ravel()
        # unbuffered |= — duplicate word indices must all apply
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_many(self, keys) -> np.ndarray:
        """Vectorized membership: bool array aligned with ``keys``."""
        keys = np.asarray(keys, dtype=object)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions_many(keys)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        mask = np.uint64(1) << (pos & np.uint64(63))
        return np.all((word & mask) != 0, axis=1)

    def add(self, key: str) -> None:
        self.add_many([key])

    def __contains__(self, key: str) -> bool:
        return bool(self.contains_many([key])[0])

    @classmethod
    def build(cls, keys, fp_rate: float = 0.01) -> "BloomFilter":
        keys = list(keys)
        bf = cls(len(keys), fp_rate)
        if keys:
            bf.add_many(keys)
        return bf
