"""Stable 64-bit hashing used for blocking keys, shingles and salting.

All hashes are deterministic across processes (no PYTHONHASHSEED
dependence) — required for resumable partitions and for the N-vs-4N
scaling runs to produce identical results.
"""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def fnv1a_64(data: bytes) -> int:
    """Scalar FNV-1a 64-bit (public-domain algorithm)."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_strings(strings, seed: int = 0) -> np.ndarray:
    """Stable 63-bit hash of an iterable of python strings, as int64.

    Python-level loop over *strings* (not chars); FNV-1a over utf-8 bytes.
    Masked to 63 bits because Ray Data's groupby/join key path round-trips
    keys through Python ints and mishandles values ≥ 2^63 (observed in Ray
    2.49: uint64 keys with the high bit set get pickled as objects).
    63 bits keeps collision probability negligible at test/bench scale; at
    10^12-row scale node ids widen to 128-bit (two int64 columns).
    """
    out = np.empty(len(strings), dtype=np.int64)
    s64 = (seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    for i, s in enumerate(strings):
        out[i] = (fnv1a_64(s.encode("utf-8")) ^ s64) & 0x7FFFFFFFFFFFFFFF
    return out


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — turns any u64 array into a
    well-mixed u64 array. Used to derive independent hash families."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
        return (z ^ (z >> np.uint64(31))).astype(np.uint64)
