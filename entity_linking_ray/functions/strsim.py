"""String-similarity scalar functions for pairwise scoring.

The reference's pairwise decision function is a BERT binary scorer
(``entity_sort/el_models.py:12-95``). Per the north-star contract this
engine replaces it with a deterministic, calibrated combination of
Jaro-Winkler + Levenshtein-ratio + embedding cosine (SURVEY.md §2.8).

Implementations are textbook public algorithms; the per-pair loops are
batched (one Python call per pair, C-level char ops inside) which is the
hot-path-acceptable shape because pairwise scoring runs *after* blocking —
pair counts are capped per block (skew guard), so batches stay small
relative to the document stream.
"""

from __future__ import annotations

import numpy as np


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    t = transpositions / 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    j = jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 == c2:
            prefix += 1
        else:
            break
    return j + prefix * prefix_weight * (1 - j)


def levenshtein(s1: str, s2: str) -> int:
    """Iterative two-row DP (Wagner–Fischer)."""
    if s1 == s2:
        return 0
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def levenshtein_ratio(s1: str, s2: str) -> float:
    """Normalized similarity: 1 - dist / max(len). 1.0 for two empties."""
    m = max(len(s1), len(s2))
    if m == 0:
        return 1.0
    return 1.0 - levenshtein(s1, s2) / m


def jaro_winkler_batch(a, b) -> np.ndarray:
    """Pairwise JW over two equal-length string sequences."""
    return np.fromiter(
        (jaro_winkler(x, y) for x, y in zip(a, b)), dtype=np.float64, count=len(a)
    )


def levenshtein_ratio_batch(a, b) -> np.ndarray:
    """Pairwise normalized Levenshtein similarity: 1 - dist/max(len)."""
    out = np.empty(len(a), dtype=np.float64)
    for i, (x, y) in enumerate(zip(a, b)):
        m = max(len(x), len(y))
        out[i] = 1.0 if m == 0 else 1.0 - levenshtein(x, y) / m
    return out
