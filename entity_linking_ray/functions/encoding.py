"""Model-input encoding builders (M9, M14, M15) — the feature-prep
operators the reference feeds its scorers with, re-expressed as pure batch
functions so a training pipeline over a Dataset can build tensors without
torch/a vocab in this sandbox.

- :func:`solr_escape` — reference ``candidate_retrieval/utils.py:15-30``:
  Lucene special-character escaping + OR/AND keyword lowercasing (M9).
- :func:`concat_context_candidate` — reference ``crossencoder/
  train_cross.py:43-60`` (``modify``): per (context, candidate) pair emit
  ``context + candidate[1:]`` (candidate's [CLS] dropped) truncated to
  ``max_seq_length`` (M14).
- :func:`build_pair_features` — reference ``entity_sort/el_main.py:
  455-490``: tokens_a = [unused1] subject-chars [unused2] + KB text;
  tokens_b = left-context + [unused3] + mention + [unused4] +
  right-context; plus the two ONE-HOT span masks — ``entity_ids`` over
  the mention span (offset into segment B) and ``entity_can_ids`` over
  the candidate-subject span — and the attention mask (M15). Tokenization
  is the repo's BasicTokenizer analogue (lowercase + CJK char isolation,
  ``functions/embed._tokenize``); a real BERT vocab swaps in by mapping
  the emitted token strings to ids.
"""

from __future__ import annotations

import re

ESCAPE_CHARS_RE = re.compile(r'(?<!\\)(?P<char>[&|+\-!(){}[\]\/^"~*?:])')
_INTERIOR = re.compile(r"\s+(OR|AND)\s+")
_START = re.compile(r"^(OR|AND) ")
_END = re.compile(r" (OR|AND)$")

ENT_START, ENT_END, CTX_LEFT_END, CTX_RIGHT_START = (
    "[unused1]", "[unused2]", "[unused3]", "[unused4]")


def solr_escape(string: str) -> str:
    """M9: Lucene query escaping (utils.py:15-30 semantics, including the
    bare-keyword and edge-keyword lowercasing)."""
    if string in ("OR", "AND"):
        return string.lower()
    string = _INTERIOR.sub(lambda m: m.group(0).lower(), string)
    string = _START.sub(lambda m: m.group(0).lower(), string)
    string = _END.sub(lambda m: m.group(0).lower(), string)
    return ESCAPE_CHARS_RE.sub(r"\\\g<char>", string)


def concat_context_candidate(context_ids: list[list[int]],
                             candidate_ids: list[list[list[int]]],
                             max_seq_length: int) -> list[list[list[int]]]:
    """M14 (train_cross.py::modify): for each row, each of its candidates
    becomes ``context + candidate[1:]`` truncated to max_seq_length."""
    out = []
    for ctx, cands in zip(context_ids, candidate_ids):
        out.append([(list(ctx) + list(c)[1:])[:max_seq_length] for c in cands])
    return out


def _char_tokenize(text: str) -> list[str]:
    """BasicTokenizer stand-in: lowercase; CJK codepoints isolate; spaced
    words stay whole (the reference's 分字 per-char behavior applies to
    CJK, which _tokenize already isolates)."""
    from .embed import _tokenize

    return _tokenize(text)


def build_pair_features(subject: str, kb_text: str, text: str,
                        start: int, end: int,
                        max_seq_len: int = 256) -> dict:
    """M15: paired token sequence + one-hot span masks (el_main.py:455-490).

    ``start``/``end`` are char offsets of the mention in ``text``
    (end-exclusive, unlike the reference's end-inclusive slice — the repo
    convention everywhere else). Returns token STRINGS plus int masks:

    - ``tokens``: [CLS] tokens_a [SEP] tokens_b [SEP] (padded with [PAD])
    - ``token_type_ids``: 0 over segment A, 1 over segment B
    - ``attention_mask``: 1 over real tokens
    - ``entity_ids``: 1 over the mention span inside segment B, widened by
      one marker on each side (reference start_id = offset+start-1,
      end_id = offset+end+1)
    - ``entity_can_ids``: 1 over [unused1] subject [unused2]
    """
    tokens_w = [ENT_START] + _char_tokenize(subject) + [ENT_END]
    can_len = len(tokens_w)
    pre = _char_tokenize(text[:start]) + [CTX_LEFT_END]
    label = _char_tokenize(text[start:end])
    post = [CTX_RIGHT_START] + _char_tokenize(text[end:])
    real_start = len(pre)
    real_end = len(pre) + len(label)
    tokens_a = tokens_w + _char_tokenize(kb_text)
    tokens_b = pre + label + post

    # encode_plus(truncation='only_first') analogue: trim segment A so
    # [CLS] A [SEP] B [SEP] fits max_seq_len
    budget_a = max_seq_len - 3 - len(tokens_b)
    if budget_a < can_len:  # never truncate into the candidate span
        budget_a = can_len
    tokens_a = tokens_a[:budget_a]
    seq = ["[CLS]"] + tokens_a + ["[SEP]"] + tokens_b + ["[SEP]"]
    seq = seq[:max_seq_len]
    n_real = len(seq)
    offset = 2 + len(tokens_a)  # index where segment B starts (first 1)

    token_type_ids = [0] * min(offset, max_seq_len) + \
        [1] * max(0, n_real - offset)
    attention_mask = [1] * n_real
    entity_ids = [0] * max_seq_len
    for i in range(max(offset + real_start - 1, 0),
                   min(offset + real_end + 1, max_seq_len)):
        entity_ids[i] = 1
    entity_can_ids = [0] * max_seq_len
    for i in range(1, min(can_len + 1, max_seq_len)):
        entity_can_ids[i] = 1

    pad = max_seq_len - n_real
    return {
        "tokens": seq + ["[PAD]"] * pad,
        "token_type_ids": (token_type_ids + [0] * pad)[:max_seq_len],
        "attention_mask": (attention_mask + [0] * pad)[:max_seq_len],
        "entity_ids": entity_ids,
        "entity_can_ids": entity_can_ids,
    }
