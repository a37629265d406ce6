"""Mention extraction: interleaved documents → mentions table.

Reference semantics: dictionary (alias-table) mention extraction — jieba
user-dict segmentation + stop-word filter + first-occurrence positions
(``entity_sort/el_main.py:525-568``, ``service_main.py:108-134``; alias
table from ``el_process.py:19-44``, sorted by length desc = longest-match
priority ``el_process.py:65``). Re-expressed Ray-Data-first:

- The alias dictionary is broadcast once (``ray.put`` on the driver); each
  actor builds its matcher state (length-preserving normalization table +
  one compiled longest-first regex alternation) ONCE in ``__init__`` —
  the A8 "load user dict once per process" analogue.
- Matching runs per Arrow batch over the ``spans`` column; only
  ``kind == "text"`` spans are scanned; media spans pass through untouched.
- Offsets are char offsets (CJK-safe): the normalization used for matching
  is built to be length-preserving so match positions are valid in the
  ORIGINAL text (combining marks standalone map to a placeholder char).
- Word-boundary guards apply to alphanumeric-edged aliases only, so CJK
  aliases match inside unsegmented text (the jieba-replacement behavior).

Scale note: a compiled re2-style alternation is C-speed and fine up to
~10^4 aliases; for a 5.9M-alias KB (reference ``main_dense.py:119``) the
drop-in replacement is an Aho-Corasick automaton built in ``__init__`` from
the same broadcast alias list — the stage contract does not change.
"""

from __future__ import annotations

import re
import sys
import unicodedata

import numpy as np
import pyarrow as pa

import ray

from ..functions.normalize import normalize_str

CONTEXT_CHARS = 120
# reference stop-word filter analogue (el_main.py:534-537)
DEFAULT_STOPWORDS = frozenset(
    "the a an of and or to in is it on at by for with 的 了 在 是 和".split()
)
_PLACEHOLDER = "\x01"


def build_norm_table() -> dict[int, str]:
    """Length-preserving per-char normalization table for str.translate:
    accent-strip + lowercase where the NFD result is a single char; standalone
    combining marks map to a placeholder so offsets stay aligned."""
    table: dict[int, str] = {}
    for cp in range(0x09, 0x300):
        ch = chr(cp)
        if ch.isspace():
            if ch != " ":
                table[cp] = " "
            continue
        n = normalize_str(ch)
        if len(n) == 1 and n != ch:
            table[cp] = n
        elif len(n) == 0:
            table[cp] = _PLACEHOLDER
    for cp in range(0x300, 0x370):  # combining diacritics block
        table[cp] = _PLACEHOLDER
    for cp in range(0x1E00, 0x1F00):  # latin extended additional
        ch = chr(cp)
        n = normalize_str(ch)
        if len(n) == 1:
            table[cp] = n
    return table


class AliasMatcher:
    """Driver- or actor-side matcher state. Built once; applied per batch."""

    def __init__(self, aliases: list[str], stopwords=DEFAULT_STOPWORDS):
        self.norm_table = build_norm_table()
        norm = sorted(
            {normalize_str(a) for a in aliases} - set(stopwords) - {""},
            key=lambda s: (-len(s), s),
        )
        parts = []
        for a in norm:
            esc = re.escape(a)
            pre = r"(?<![0-9a-z])" if a[:1].isalnum() and ord(a[0]) < 0x2E80 else ""
            post = r"(?![0-9a-z])" if a[-1:].isalnum() and ord(a[-1]) < 0x2E80 else ""
            parts.append(f"{pre}{esc}{post}")
        self.pattern = re.compile("|".join(parts)) if parts else None

    def normalize_keep_length(self, text: str) -> str:
        out = text.translate(self.norm_table)
        if len(out) != len(text):  # rare multi-char expansions — per-char fallback
            out = "".join(
                (lambda n: n if len(n) == 1 else _PLACEHOLDER)(normalize_str(c)) for c in text
            )
        return out

    def find(self, text: str):
        """Yields (start, end, norm_surface) matches in *text* (char offsets
        valid in the original string)."""
        if self.pattern is None:
            return
        norm = self.normalize_keep_length(text)
        for m in self.pattern.finditer(norm):
            yield m.start(), m.end(), m.group(0)


class MentionExtractor:
    """map_batches actor: documents(doc_id, spans) → mentions rows.

    ``aliases`` may be a list or a ``ray.ObjectRef`` to one (broadcast via
    ``ray.put`` — read zero-copy from the object store in every actor,
    never re-shipped per batch).
    """

    def __init__(self, aliases, stopwords=DEFAULT_STOPWORDS, context_chars: int = CONTEXT_CHARS):
        if isinstance(aliases, ray.ObjectRef):
            aliases = ray.get(aliases)
        self.matcher = AliasMatcher(aliases, stopwords=stopwords)
        self.context_chars = context_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out = {
            "doc_id": [], "span_idx": [], "mention": [], "norm_mention": [],
            "context_left": [], "context_right": [], "offset": [],
        }
        cw = self.context_chars
        for doc_id, spans in zip(doc_ids, spans_col):
            if not spans:
                continue
            for si, sp in enumerate(spans):
                if sp["kind"] != "text" or not sp["text"]:
                    continue
                text = sp["text"]
                base = sp["offset"]
                for s, e, norm_surface in self.matcher.find(text):
                    out["doc_id"].append(doc_id)
                    out["span_idx"].append(si)
                    out["mention"].append(text[s:e])
                    out["norm_mention"].append(norm_surface)
                    out["context_left"].append(text[max(0, s - cw):s])
                    out["context_right"].append(text[e:e + cw])
                    out["offset"].append(base + s)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "span_idx": pa.array(out["span_idx"], pa.int32()),
                "mention": pa.array(out["mention"], pa.string()),
                "norm_mention": pa.array(out["norm_mention"], pa.string()),
                "context_left": pa.array(out["context_left"], pa.string()),
                "context_right": pa.array(out["context_right"], pa.string()),
                "offset": pa.array(out["offset"], pa.int32()),
            }
        )


# worker-process-level matcher cache for the task-pool path: Ray reuses
# worker processes across tasks, so the matcher compiles once per worker —
# actor-pool amortization without actor-pool scheduling (ramp-up/starvation)
_TASK_MATCHERS: dict = {}


def extract_mentions(docs: "ray.data.Dataset", aliases: list[str],
                     concurrency: int | tuple = 4, batch_size: int = 256,
                     stopwords=DEFAULT_STOPWORDS,
                     pool: str = "actor") -> "ray.data.Dataset":
    """The pipeline stage: broadcast the alias list once; matcher state is
    built once per actor (default — amortized like the reference's
    load-once service process) or once per worker process with
    ``pool="task"`` (elastic tasks + worker-level cache; measured slower
    here because task-pool fusion serializes the stage chain)."""
    alias_ref = ray.put(list(aliases))

    if pool == "actor":
        if isinstance(concurrency, int):
            # a fixed-size pool can reserve every CPU and starve the task
            # operators (observed deadlock at num_cpus=4) — autoscale from 1
            concurrency = (1, max(1, concurrency))
        return docs.map_batches(
            MentionExtractor,
            fn_constructor_kwargs={"aliases": alias_ref, "stopwords": stopwords},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    key = alias_ref.hex() if hasattr(alias_ref, "hex") else str(alias_ref)

    def extract(batch: pa.Table) -> pa.Table:
        ext = _TASK_MATCHERS.get(key)
        if ext is None:
            ext = MentionExtractor(alias_ref, stopwords=stopwords)
            _TASK_MATCHERS.clear()
            _TASK_MATCHERS[key] = ext
        return ext(batch)

    return docs.map_batches(extract, batch_format="pyarrow", batch_size=batch_size)
