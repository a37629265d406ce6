"""Deterministic hash embedder — the bi-encoder stand-in.

The reference embeds mention contexts and entity descriptions with a BERT
bi-encoder into 768-d CLS vectors (``entity_candidate/biencoder/
biencoder_.py:73-145``). No GPU/weights exist in this sandbox, so this
module provides a deterministic *feature-hashing* embedder with the same
interface shape: text → unit vector, batched. A trained model drops in by
replacing :class:`HashEmbedder` inside the actor-pool stage (stages/ann.py)
— the Ray plumbing (actor pools, broadcast matrices, sharded indexes) is
identical.

Construction: each token hashes to a pseudo-random unit direction
(splitmix64-seeded signs over ``dim`` buckets, 4 probes per token — classic
feature hashing / random indexing); a text's vector is the L2-normalized sum
of its token vectors. Deterministic across processes, vectorized in numpy.
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

U64 = np.uint64
# 256 keeps random-text cosine noise ≈ 0.05 mean / ≤0.2 max-over-50
# (measured), which the calibrated threshold relies on; the reference's
# trained encoder uses 768 (biencoder_.py:73).
DEFAULT_DIM = 256
_PROBES = 4


def _tokenize(text: str) -> list[str]:
    """Whitespace tokens for spaced scripts + individual CJK codepoints
    (reference isolates CJK chars, tokenization.py:217-240)."""
    if text.isascii():  # fast path: no CJK scan needed (C-level)
        return text.lower().split()
    out: list[str] = []
    for tok in text.lower().split():
        run: list[str] = []
        for ch in tok:
            o = ord(ch)
            if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
                if run:
                    out.append("".join(run))
                    run = []
                out.append(ch)
            else:
                run.append(ch)
        if run:
            out.append("".join(run))
    return out


def _token_hash(tok: str) -> int:
    h = 0xCBF29CE484222325
    for b in tok.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


# per-process token-hash memo — token vocabularies repeat heavily across
# batches, and the bytes-level FNV loop is the only pure-Python hot spot
_HASH_CACHE: dict[str, int] = {}
_HASH_CACHE_MAX = 1_000_000


def _token_hash_cached(tok: str) -> int:
    h = _HASH_CACHE.get(tok)
    if h is None:
        h = _token_hash(tok)
        if len(_HASH_CACHE) >= _HASH_CACHE_MAX:
            _HASH_CACHE.clear()
        _HASH_CACHE[tok] = h
    return h


def embed_texts(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """[n, dim] float32, rows L2-normalized (zero vector for empty text).
    Vectorized across the whole batch: all texts' (deduped) tokens are
    flattened into one hashed u64 array with per-text segment ids; the
    probe scatter runs as ``np.add.at`` on the full 2-D output — no
    per-text numpy calls (binary bag-of-tokens: repeats within a text are
    deduped so boilerplate doesn't dominate the norm). An all-Arrow
    tokenize+hash fast path was A/B'd and REVERTED: corpus token
    vocabularies repeat heavily, so the memoized dict path is pure C-level
    hits and beat the vectorized re-hash-every-occurrence variant ~3×
    on the bench corpus (the measurement lives in BASELINE.md)."""
    n = len(texts)
    out = np.zeros((n, dim), dtype=np.float32)
    if n == 0:
        return out
    seg: list[int] = []
    hashes: list[int] = []
    # C-level map over the cache hit path; misses fall through to the FNV
    # loop inside _token_hash_cached (token vocabularies repeat heavily, so
    # the steady state is one dict hit per token)
    hcached = _token_hash_cached
    for i, text in enumerate(texts):
        toks = set(_tokenize(text))
        if not toks:
            continue
        seg.extend([i] * len(toks))
        hashes.extend(map(hcached, toks))
    if not hashes:
        return out
    th = np.array(hashes, dtype=U64)
    rows = np.array(seg, dtype=np.int64)
    probe_salt = splitmix64(np.arange(_PROBES, dtype=U64) + U64(0xABCD))
    for p in range(_PROBES):
        hp = splitmix64(th ^ probe_salt[p])
        idx = (hp % U64(dim)).astype(np.int64)
        sign = np.where((hp >> U64(32)) & U64(1), 1.0, -1.0).astype(np.float32)
        np.add.at(out, (rows, idx), sign)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


def cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[len(a), len(b)] cosine for row-normalized inputs (plain matmul)."""
    return a @ b.T
