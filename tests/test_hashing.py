"""Differential tests for the vectorized single-block MD5 (hashing.py).

shuffle_shard / sample_weighted / source_cap / mix_corpora draw one seeded
pseudorandom key per document; the engine computes them with a numpy
implementation of the md5 compression function instead of per-row hashlib
calls.  These tests pin bit-identity against hashlib on adversarial id
shapes (digit-count boundaries, int64 extremes, empty input, negatives →
scalar fallback) and the order-preservation contract of the raw-digest
sort key.  No Ray needed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgegraph__bh_ray.functions.hashing import (
    seeded_md5_digests,
    seeded_md5_hex,
    seeded_md5_sortkey,
    seeded_md5_u32,
)


def ref_hex(seed: str, i: int) -> str:
    return hashlib.md5(f"{seed}:{i}".encode()).hexdigest()


DIGIT_EDGES = [0, 1, 9, 10, 11, 99, 100, 101, 999, 1000]
EXTREMES = [10**17 - 1, 10**17, 10**18 - 1, 10**18, 2**62, 2**63 - 1]


@pytest.mark.parametrize("seed", ["s0", "w1", "m0", "", "日本-seed"])
def test_hex_matches_hashlib(seed):
    ids = np.array(DIGIT_EDGES + EXTREMES, dtype=np.int64)
    got = seeded_md5_hex(seed, ids)
    assert [str(h) for h in got] == [ref_hex(seed, int(i)) for i in ids]


def test_u32_matches_hashlib():
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 2**62, 300)
    got = seeded_md5_u32("w1", ids)
    assert got.dtype == np.int64
    assert [int(v) for v in got] == [int(ref_hex("w1", int(i))[:8], 16) for i in ids]


def test_digests_match_hashlib_random():
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 2**63 - 1, 500)
    d = seeded_md5_digests("s0", ids)
    assert d.shape == (500, 16)
    for i in range(0, 500, 7):
        assert d[i].tobytes() == hashlib.md5(f"s0:{ids[i]}".encode()).digest()


def test_sortkey_order_equals_hex_order():
    """Raw digest bytes (trailing-NUL-stripped by numpy S access) must rank
    identically to the hexdigest strings the DuckDB mirrors rank by."""
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 2**62, 4000)
    k = seeded_md5_sortkey("s0", ids)
    hexes = np.array([ref_hex("s0", int(i)) for i in ids])
    assert list(np.argsort(k, kind="stable")) == list(
        np.argsort(hexes, kind="stable")
    )


def test_empty_and_negative_fallback():
    assert seeded_md5_digests("s0", np.array([], dtype=np.int64)).shape == (0, 16)
    assert len(seeded_md5_hex("s0", [])) == 0
    assert len(seeded_md5_u32("s0", [])) == 0
    neg = np.array([-1, -99, 5], dtype=np.int64)
    got = seeded_md5_hex("s0", neg)
    # negative ids route through the hashlib fallback but stay identical
    d = seeded_md5_digests("s0", neg)
    for i, x in enumerate(neg):
        assert d[i].tobytes() == hashlib.md5(f"s0:{x}".encode()).digest()


@settings(max_examples=60, deadline=None)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=40),
    seed=st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
        max_size=8,
    ),
)
def test_hypothesis_differential(ids, seed):
    arr = np.array(ids, dtype=np.int64)
    got = seeded_md5_hex(seed, arr)
    assert [str(h) for h in got] == [ref_hex(seed, i) for i in ids]
