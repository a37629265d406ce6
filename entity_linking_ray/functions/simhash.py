"""64-bit SimHash document fingerprints (Charikar 2002) — near-dup family.

Not present in the reference (SURVEY.md §2.7 D5 — absent); added as part of
the large-scale training-data dedup suite. Vectorized: token hashes → bit
matrix votes via numpy unpacking.
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

U64 = np.uint64


def token_hashes(text: str) -> np.ndarray:
    """u64 hash per whitespace token (case-folded)."""
    toks = text.lower().split()
    if not toks:
        return np.empty(0, dtype=U64)
    # FNV over bytes per token — python loop over tokens, C inner ops.
    out = np.empty(len(toks), dtype=U64)
    for i, t in enumerate(toks):
        h = 0xCBF29CE484222325
        for b in t.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return splitmix64(out)


def simhash64(text: str) -> int:
    h = token_hashes(text)
    if len(h) == 0:
        return 0
    # bits: [n_tokens, 64] in {0,1} → votes per bit position
    bits = ((h[:, None] >> np.arange(64, dtype=U64)[None, :]) & U64(1)).astype(np.int64)
    votes = bits.sum(axis=0) * 2 - len(h)  # >0 → bit set
    out = U64(0)
    set_bits = np.nonzero(votes > 0)[0]
    for b in set_bits:
        out |= U64(1) << U64(int(b))
    return int(out)


def hamming64(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """Vectorized Hamming distance between u64 arrays."""
    x = np.bitwise_xor(np.asarray(a, dtype=U64), U64(b) if np.isscalar(b) else np.asarray(b, dtype=U64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(np.atleast_1d(x)), 8), axis=1).sum(axis=1)
