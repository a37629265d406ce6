"""Space-filling-curve layout keys for partitioned writes.

At 100 TB the write layout IS a query optimization: sorting a partition
by a Morton (Z-order) interleave of two access-pattern columns keeps
rows that are close in BOTH dimensions close on disk, so min/max
row-group pruning works for range predicates on either column — the
standard lakehouse clustering trick, computed here as pure vectorized
numpy bit-spreading (no Python loop, no UDF rows).
"""

from __future__ import annotations

import numpy as np

_MASKS = (
    np.uint64(0x0000FFFF0000FFFF),
    np.uint64(0x00FF00FF00FF00FF),
    np.uint64(0x0F0F0F0F0F0F0F0F),
    np.uint64(0x3333333333333333),
    np.uint64(0x5555555555555555),
)


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each u64 so bit i lands at bit 2i
    (the classic magic-mask interleave ladder)."""
    x = x & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(16))) & _MASKS[0]
    x = (x | (x << np.uint64(8))) & _MASKS[1]
    x = (x | (x << np.uint64(4))) & _MASKS[2]
    x = (x | (x << np.uint64(2))) & _MASKS[3]
    x = (x | (x << np.uint64(1))) & _MASKS[4]
    return x


def morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Z-order key interleaving the low 16 bits of two int arrays:
    bit i of ``a`` → bit 2i, bit i of ``b`` → bit 2i+1. Returns int64
    (≤ 32 bits used, so always non-negative)."""
    za = _spread16(a.astype(np.uint64))
    zb = _spread16(b.astype(np.uint64))
    return (za | (zb << np.uint64(1))).astype(np.int64)
