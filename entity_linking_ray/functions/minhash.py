"""Character-shingle MinHash + LSH banding (second blocking family).

The reference has no near-dup blocking (SURVEY.md §2.7 D5); the north-star
contract adds MinHash-LSH over character shingles. Standard construction
(Broder 1997; LSH banding per Mining of Massive Datasets ch.3):

    shingles(s, k)  → set of k-char substrings
    minhash         → per permutation i: min over shingles of h_i(shingle)
    bands           → split the signature into b bands of r rows; each band
                      hashes to one bucket key; docs sharing any band bucket
                      are near-dup candidates.

Vectorization: shingle hashing is a numpy polynomial rolling hash over the
string's codepoints (one vector op per k), and the permutation family is
``splitmix64(shingle_hash ^ seed_i)`` — no Python inner loop over shingles.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash_strings, splitmix64

U64 = np.uint64
_EMPTY_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def shingle_hashes(s: str, k: int = 5) -> np.ndarray:
    """u64 hashes of all k-char shingles of *s* (deduplicated)."""
    cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(U64)
    n = len(cps) - k + 1
    if n <= 0:
        # short string → single shingle = whole string
        if len(cps) == 0:
            return np.empty(0, dtype=U64)
        acc = np.zeros(1, dtype=U64)
        for j in range(len(cps)):
            with np.errstate(over="ignore"):
                acc = acc * U64(1099511628211) + cps[j : j + 1]
        return splitmix64(acc)
    acc = np.zeros(n, dtype=U64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * U64(1099511628211) + cps[j : j + n]
    return np.unique(splitmix64(acc))


# per-process word→hash cache: the vocabulary is Zipfian and tiny next to
# the token stream, so each distinct word pays the byte-loop FNV exactly
# once per worker (bounded by vocab size, not corpus size)
_WORD_HASH_CACHE: dict[str, int] = {}


def _word_hashes(words: list[str]) -> np.ndarray:
    from .hashing import fnv1a_64

    out = np.empty(len(words), dtype=U64)
    cache = _WORD_HASH_CACHE
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = cache[w] = fnv1a_64(w.encode("utf-8"))
        out[i] = h
    return out


def word_shingle_hashes(s: str, k: int = 3) -> np.ndarray:
    """63-bit int64 hashes of all k-WORD shingles of *s* (whitespace
    split, deduplicated) — Broder w-shingling. Docs with fewer than k
    words yield no shingles (mirrors the SQL-oracle formulation, which
    excludes them). Word shingles keep a Zipfian document frequency on
    template-heavy corpora where char shingles collapse to a few thousand
    common grams and prefix-filter blocking loses all selectivity.

    The gram hash is a rolling polynomial over cached per-WORD hashes
    (k vector ops per doc) — never a per-gram string build + byte hash,
    which was the measured hotspot of the exact-Jaccard self-join."""
    w = s.split()
    if len(w) < k:
        return np.empty(0, dtype=np.int64)
    hv = splitmix64(_word_hashes(w))
    n = len(w) - k + 1
    acc = np.zeros(n, dtype=U64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * U64(1099511628211) + hv[j:j + n]
    return np.unique(
        (splitmix64(acc) & U64(0x7FFFFFFFFFFFFFFF)).astype(np.int64))


def minhash_signature(s: str, num_perm: int = 64, k: int = 5, seed: int = 7) -> np.ndarray:
    """[num_perm] u64 signature."""
    sh = shingle_hashes(s, k)
    if len(sh) == 0:
        return np.full(num_perm, _EMPTY_SENTINEL, dtype=U64)
    seeds = splitmix64(
        np.arange(1, num_perm + 1, dtype=U64) * U64(0x9E3779B97F4A7C15) + U64(seed)
    )
    # [num_perm, n_shingles] without materializing when n is large: loop perms
    # only (num_perm is small, shingle vector is the long axis).
    out = np.empty(num_perm, dtype=U64)
    for i in range(num_perm):
        out[i] = splitmix64(sh ^ seeds[i]).min()
    return out


def signature_matrix(strings, num_perm: int = 64, k: int = 5, seed: int = 7) -> np.ndarray:
    """[len(strings), num_perm] u64 — batched driver for map_batches.

    Vectorized across the WHOLE batch: all documents' shingle hashes are
    flattened into one array with per-document offsets; each permutation
    is one ``splitmix64`` pass + one segmented ``np.minimum.reduceat``
    (num_perm array ops total, instead of num_perm × n_docs tiny ones —
    measured ~10× on 300-char docs)."""
    n = len(strings)
    out = np.full((n, num_perm), _EMPTY_SENTINEL, dtype=U64)
    if n == 0:
        return out
    shs = [shingle_hashes(s, k) for s in strings]
    lens = np.array([len(x) for x in shs], dtype=np.int64)
    nz = lens > 0
    if not nz.any():
        return out
    flat = np.concatenate([x for x in shs if len(x)])
    nz_lens = lens[nz]
    starts = np.zeros(len(nz_lens), dtype=np.int64)
    np.cumsum(nz_lens[:-1], out=starts[1:])
    seeds = splitmix64(
        np.arange(1, num_perm + 1, dtype=U64) * U64(0x9E3779B97F4A7C15) + U64(seed)
    )
    mins = np.empty((len(nz_lens), num_perm), dtype=U64)
    for i in range(num_perm):
        mins[:, i] = np.minimum.reduceat(splitmix64(flat ^ seeds[i]), starts)
    out[nz] = mins
    return out


def band_keys(signatures: np.ndarray, num_bands: int = 16) -> np.ndarray:
    """Hash each band of each signature to one u64 bucket key.

    Returns [n_rows, num_bands]. Bucket key mixes in the band index so the
    same band value in different bands never collides.
    """
    n, num_perm = signatures.shape
    assert num_perm % num_bands == 0, "num_perm must divide into bands"
    r = num_perm // num_bands
    bands = signatures.reshape(n, num_bands, r)
    with np.errstate(over="ignore"):
        acc = np.zeros((n, num_bands), dtype=U64)
        for j in range(r):
            acc = acc * U64(1099511628211) + bands[:, :, j]
        acc ^= splitmix64(np.arange(num_bands, dtype=U64) + U64(101))[None, :]
    # int64-masked for the same Ray groupby-key reason as hashing.hash_strings
    return (splitmix64(acc) & U64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard (verification step after LSH candidates)."""
    sa, sb = shingle_hashes(a, k), shingle_hashes(b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    if len(sa) == 0 or len(sb) == 0:
        return 0.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)
