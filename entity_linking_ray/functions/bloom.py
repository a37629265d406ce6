"""Blocked Bloom filter over 63-bit key hashes — the join-pruning side
structure (a fixed-size, mergeable bitset; partials OR together, so it
builds as a per-batch combiner and broadcasts once via ``ray.put``).

k bit positions per key come from independent splitmix64 re-mixes of the
key hash. False-positive rate ≈ (1 - e^{-kn/m})^k; at the default
m = 2^23 bits (1 MiB) and k = 4 it stays < 1% up to ~1M keys. A false
positive only sends a row through the exact join it would have skipped —
correctness never depends on the filter.
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

U64 = np.uint64


def _as_u64(h: np.ndarray) -> np.ndarray:
    h = np.asarray(h)
    if h.dtype == np.int64:
        return h.view(U64)
    return h.astype(U64, copy=False)


def _positions(h: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """[len(h), k] bit positions; independent mixes per probe index."""
    out = np.empty((len(h), k), dtype=np.int64)
    x = h.astype(U64, copy=True)
    with np.errstate(over="ignore"):
        for i in range(k):
            x = splitmix64(x + U64(0x9E3779B97F4A7C15))
            out[:, i] = (x % U64(n_bits)).astype(np.int64)
    return out


def bloom_build(h: np.ndarray, n_bits: int = 1 << 23,
                k: int = 4) -> np.ndarray:
    """Word array (uint64, n_bits/64 long) with the k bits of every hash
    set. Merge partial filters with ``np.bitwise_or``."""
    assert n_bits % 64 == 0
    words = np.zeros(n_bits // 64, dtype=U64)
    if len(h):
        pos = _positions(_as_u64(h).reshape(-1), n_bits, k).reshape(-1)
        np.bitwise_or.at(words, pos >> 6,
                         U64(1) << (pos.astype(U64) & U64(63)))
    return words


def bloom_might_contain(words: np.ndarray, h: np.ndarray,
                        k: int = 4) -> np.ndarray:
    """Boolean mask: True = possibly present, False = DEFINITELY absent."""
    n_bits = len(words) * 64
    if not len(h):
        return np.zeros(0, dtype=bool)
    pos = _positions(_as_u64(h).reshape(-1), n_bits, k)
    got = (words[pos >> 6] >> (pos.astype(U64) & U64(63))) & U64(1)
    return (got == 1).all(axis=1)
