"""Text-analysis scalar kernels for the training-data pipeline suite:
language-ID heuristic, quality scoring, token counting, fingerprinting.

These extend the engine beyond the reference (which has only tokenize/
normalize, SURVEY.md §2.8) per the large-scale-training-data requirement.
All kernels are batched: one call per Arrow batch, numpy/pandas/pyarrow
vector ops inside.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Tiny per-language stopword profiles (public common function words).
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the a of and to in is it you that he was for on are".split()),
    "fr": frozenset("le la les de des un une et en du que qui dans pour est".split()),
    "es": frozenset("el la los las de un una y en del que es por para con".split()),
    "de": frozenset("der die das ein eine und in von zu mit den dem ist für".split()),
}
_CJK_RANGES = ((0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x3040, 0x30FF))

# A "word" for token counting: letter/number runs OR single CJK chars —
# a BPE-ish regex in the spirit of GPT-2's pretokenizer, re2-compatible.
TOKEN_REGEX = r"[\p{L}\p{N}]+(?:'[\p{L}]+)?|[^\s\p{L}\p{N}]"


def cjk_ratio(text: str) -> float:
    if not text:
        return 0.0
    n = sum(1 for ch in text if any(lo <= ord(ch) <= hi for lo, hi in _CJK_RANGES))
    return n / len(text)


def detect_language(text: str) -> str:
    """n-gram-free heuristic: CJK char ratio → 'zh'; else argmax stopword
    hit-rate across profiles; 'und' when nothing matches."""
    if cjk_ratio(text) > 0.2:
        return "zh"
    toks = text.lower().split()
    if not toks:
        return "und"
    best_lang, best_hits = "und", 0
    for lang, stops in STOPWORDS.items():
        hits = sum(1 for t in toks if t in stops)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def detect_language_batch(texts) -> np.ndarray:
    return np.array([detect_language(t) for t in texts], dtype=object)


def token_count_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized whitespace token count (re2 split + list length)."""
    return pc.list_value_length(
        pc.split_pattern_regex(pc.utf8_trim_whitespace(arr), r"\s+")
    )


STOPWORD_PATTERN = r"(?i)\b(?:" + "|".join(
    sorted(set().union(*STOPWORDS.values()))) + r")\b"


def quality_features(table: pa.Table, text_col: str = "text") -> pa.Table:
    """Appends n_chars_calc, n_tokens, n_alpha, n_stop (exact integer
    counts — the DuckDB-oracle surface) plus mean_token_len, alpha_ratio,
    stopword_ratio — the length/punct/stopword quality heuristics."""
    txt = table[text_col]
    n_chars = pc.utf8_length(txt)
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(txt), r"\s+")
    n_tokens = pc.list_value_length(toks)
    n_alpha = pc.utf8_length(pc.replace_substring_regex(txt, r"[^\p{L}]", ""))
    alpha_ratio = pc.divide(
        pc.cast(n_alpha, pa.float64()),
        pc.max_element_wise(pc.cast(n_chars, pa.float64()), 1.0),
    )
    mean_tok = pc.divide(
        pc.cast(n_chars, pa.float64()),
        pc.max_element_wise(pc.cast(n_tokens, pa.float64()), 1),
    )
    # stopword ratio: vectorized via per-row python over the token lists is
    # avoided — count matches of a stopword alternation instead (re2).
    n_stop = pc.count_substring_regex(txt, STOPWORD_PATTERN)
    stop_ratio = pc.divide(
        pc.cast(n_stop, pa.float64()),
        pc.max_element_wise(pc.cast(n_tokens, pa.float64()), 1),
    )
    return (
        table.append_column("n_chars_calc", pc.cast(n_chars, pa.int64()))
        .append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
        .append_column("n_alpha", pc.cast(n_alpha, pa.int64()))
        .append_column("n_stop", pc.cast(n_stop, pa.int64()))
        .append_column("mean_token_len", mean_tok)
        .append_column("alpha_ratio", alpha_ratio)
        .append_column("stopword_ratio", stop_ratio)
    )


def rolling_fingerprint(text: str, window: int = 16) -> int:
    """Document fingerprint: min of rolling polynomial hashes over
    *window*-char windows (winnowing-style, Schleimer et al. 2003)."""
    data = text.encode("utf-8")
    if len(data) == 0:
        return 0
    if len(data) <= window:
        h = 0xCBF29CE484222325
        for b in data:
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(arr) - window + 1
    acc = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(window):
            acc = acc * np.uint64(1099511628211) + arr[j : j + n]
    from .hashing import splitmix64

    return int(splitmix64(acc).min())


def repetition_stats(table: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """→ (id, n_tokens, n_distinct, max_tok_freq) — the Gopher-style
    repetition quality signals (type/token ratio and the hottest token's
    count) per document, computed batch-locally: one whitespace split +
    np.unique per doc, no shuffle anywhere. A doc with
    n_distinct/n_tokens near 0 or max_tok_freq/n_tokens near 1 is
    boilerplate/template spam — the standard pre-training filter."""
    texts = table[text_col].to_pylist()
    n_tok = np.zeros(len(texts), np.int64)
    n_dis = np.zeros(len(texts), np.int64)
    mx = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        w = t.split()
        if not w:
            continue
        _, counts = np.unique(w, return_counts=True)
        n_tok[i] = len(w)
        n_dis[i] = len(counts)
        mx[i] = counts.max()
    return pa.table({
        id_col: table[id_col],
        "n_tokens": pa.array(n_tok),
        "n_distinct": pa.array(n_dis),
        "max_tok_freq": pa.array(mx),
    })


def compression_ratio_stats(batch: "pa.Table", *, text_col: str = "text",
                            id_col: str = "doc_id",
                            level: int = 6) -> "pa.Table":
    """→ (doc_id, raw_len, compressed_len, ratio_pct) — the zlib
    compression-ratio quality signal (highly compressible text ⇒
    boilerplate/repetition; the standard corpus-filtering heuristic next
    to the Gopher repetition stats). Deterministic: zlib at a fixed
    level is stable across runs/platforms for the same bytes. Rows-only
    in the battery (SQL has no DEFLATE); the ratio is integer percent so
    downstream filters stay hash-friendly."""
    import zlib

    import numpy as np
    import pyarrow as pa

    texts = batch[text_col].to_pylist()
    raw = np.array([len(t.encode("utf-8")) for t in texts], np.int64)
    comp = np.array([len(zlib.compress(t.encode("utf-8"), level))
                     for t in texts], np.int64)
    ratio = np.where(raw > 0, (comp * 100) // np.maximum(raw, 1), 100)
    return pa.table({
        id_col: batch[id_col],
        "raw_len": pa.array(raw),
        "compressed_len": pa.array(comp),
        "ratio_pct": pa.array(ratio.astype(np.int64)),
    })
