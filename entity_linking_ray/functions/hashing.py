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


_SCALAR_TAIL = 16  # below this many active strings, numpy op overhead loses


def _fnv1a_bulk(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64 over concatenated utf-8 buffers — bit-identical
    to :func:`fnv1a_64` per string (property-tested). ``data`` is the
    uint8 byte buffer, ``offsets`` the n+1 string boundaries (arbitrary
    base — Arrow buffer offsets pass through unsliced).

    Strategy: sort by length descending, then walk byte POSITIONS; at
    position p the strings still live are exactly the prefix of the sort
    order, so each step is one gather + one xor-mul over a shrinking
    slice — O(total bytes) vectorized work, no per-byte Python. The last
    ``_SCALAR_TAIL`` longest strings finish in the scalar loop so a lone
    huge document doesn't degrade into max_len tiny numpy calls."""
    n = len(offsets) - 1
    out = np.full(n, _FNV_OFFSET, np.uint64)
    if n == 0:
        return out
    offsets = np.asarray(offsets, np.int64)
    lens = offsets[1:] - offsets[:-1]
    order = np.argsort(-lens, kind="stable")
    starts = offsets[:-1][order]
    slens = lens[order]
    hs = out[order]
    asc = np.sort(lens)
    p, max_len = 0, int(slens[0])
    with np.errstate(over="ignore"):
        while p < max_len:
            active = n - int(np.searchsorted(asc, p, side="right"))
            if active <= _SCALAR_TAIL:
                break
            b = data[starts[:active] + p].astype(np.uint64)
            hs[:active] = (hs[:active] ^ b) * _FNV_PRIME
            p += 1
    active = n - int(np.searchsorted(asc, p, side="right"))
    for i in range(active):  # ≤ _SCALAR_TAIL longest strings' tails
        h = int(hs[i])
        for byte in data[int(starts[i]) + p:
                         int(starts[i]) + int(slens[i])].tobytes():
            h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        hs[i] = h
    out[order] = hs
    return out


def _finish63(h: np.ndarray, seed: int) -> np.ndarray:
    """Seed-fold + 63-bit mask (Ray Data's groupby/join key path
    round-trips keys through Python ints and mishandles values ≥ 2^63 —
    observed in Ray 2.49: uint64 keys with the high bit set get pickled
    as objects). 63 bits keeps collision probability negligible at
    test/bench scale; at 10^12-row scale node ids widen to 128-bit (two
    int64 columns)."""
    s64 = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    return ((h ^ s64) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def hash_strings(strings, seed: int = 0) -> np.ndarray:
    """Stable 63-bit hash of an iterable of python strings, as int64.
    FNV-1a over utf-8 bytes via the bulk vectorized kernel (the per-byte
    Python loop lives only in the scalar twin / long-tail finish)."""
    enc = [s.encode("utf-8") for s in strings]
    if not enc:
        return np.empty(0, np.int64)
    lens = np.fromiter((len(b) for b in enc), np.int64, len(enc))
    offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
    data = np.frombuffer(b"".join(enc), np.uint8)
    return _finish63(_fnv1a_bulk(data, offsets), seed)


def string_array_bytes(arr) -> tuple[np.ndarray, np.ndarray]:
    """(utf-8 data bytes, int64 row offsets) of a pyarrow string
    array/chunked array, ZERO-COPY off the Arrow buffers (no to_pylist,
    no encode pass). Nulls rejected loudly. Shared by the bulk hash
    kernel and the ASCII chunk gather (stages/chunking.py)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("string_array_bytes: null strings not supported")
    if len(arr) == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"expected a string array, got {arr.type}")
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], off_dtype)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8)
    return data, offsets


def hash_strings_arrow(arr, seed: int = 0) -> np.ndarray:
    """:func:`hash_strings` over a pyarrow string array/chunked array —
    zero-copy raw FNV-1a off the Arrow buffers + the 63-bit seed
    finish. Identical output to ``hash_strings(arr.to_pylist())``
    (property-tested)."""
    data, offsets = string_array_bytes(arr)
    if len(offsets) <= 1:
        return np.empty(0, np.int64)
    return _finish63(_fnv1a_bulk(data, offsets), seed)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — turns any u64 array into a
    well-mixed u64 array. Used to derive independent hash families."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
        return (z ^ (z >> np.uint64(31))).astype(np.uint64)
