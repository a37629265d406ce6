"""NER mention proposal (M1/A7) — model contract + heuristic engine.

Reference: a Flair sequence tagger behind a tiny contract
(``entity_candidate/ner.py:15-42``): ``predict(sentences)`` returns
``{"sentences": [...], "mentions": [{sent_idx, text, start_pos,
end_pos}]}``. The trained tagger needs GPU weights absent from this
sandbox, so the default engine is a deterministic capitalization
heuristic with the SAME contract — a real Flair/transformers tagger
drops in via :mod:`.model`'s load-once-per-actor protocol (pass its
factory to :func:`ner_mentions`).

Heuristic (spaced scripts): a mention is a maximal run of capitalized
tokens (upper first letter, alphabetic tail), minus a leading
sentence-initial stopword-cased token ("The" at sentence start proposes
nothing, "The Hague" mid-sentence does). CJK text has no capitalization
signal — the dictionary matcher (stages/mentions.py) is the CJK mention
source, as in the reference (jieba dict path vs Flair path).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray

_TOKEN = re.compile(r"\S+")
_CAP = re.compile(r"^[A-Z][A-Za-z'\-]*$")
# sentence-initial capitalized function words propose nothing on their own
_INITIAL_SKIP = frozenset(
    "the a an in on at of and or but he she it they we i this that".split())
_SENT_END = frozenset(".!?")


class HeuristicNER:
    """The reference NER_model contract (ner.py:15-26), heuristic engine."""

    def __init__(self, parameters=None):
        pass

    def predict(self, sentences: list[str]) -> dict:
        mentions = []
        for sent_idx, sent in enumerate(sentences):
            prev_end_char = ""  # start of sentence counts as boundary
            run: list[tuple[int, int, str]] = []

            def flush():
                if not run:
                    return
                toks = run.copy()
                # drop a leading sentence-initial function word
                if len(toks) >= 1 and toks[0][2].lower() in _INITIAL_SKIP \
                        and toks[0][3]:
                    toks = toks[1:]
                if not toks:
                    return
                s, e = toks[0][0], toks[-1][1]
                mentions.append({
                    "sent_idx": sent_idx, "text": sent[s:e],
                    "start_pos": s, "end_pos": e,
                })

            for m in _TOKEN.finditer(sent):
                tok = m.group(0)
                word = tok.rstrip(".,;:!?\"')")
                at_boundary = (m.start() == 0
                               or (prev_end_char and prev_end_char in _SENT_END))
                if _CAP.match(word):
                    run.append((m.start(), m.start() + len(word), word,
                                at_boundary))
                else:
                    flush()
                    run = []
                prev_end_char = tok[-1] if tok else prev_end_char
            flush()
        return {"sentences": sentences, "mentions": mentions}


class NERMentionStage:
    """map_batches actor: interleaved documents → the mentions schema of
    MentionExtractor (so generate_candidates composes unchanged). The NER
    model is built ONCE per actor from ``factory`` (broadcast an expensive
    tagger via ``ray.put``)."""

    def __init__(self, factory=None, context_chars: int = 120):
        if isinstance(factory, ray.ObjectRef):
            factory = ray.get(factory)
        self.model = factory() if factory else HeuristicNER()
        self.context_chars = context_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.normalize import normalize_str

        out = {"doc_id": [], "span_idx": [], "mention": [], "norm_mention": [],
               "context_left": [], "context_right": [], "offset": []}
        cw = self.context_chars
        # ONE predict() per Arrow batch (the reference contract is
        # list-in/list-out, entity_candidate/ner.py:29-42): gather every
        # text span, tag them all in one call — a GPU tagger batches —
        # then re-associate mentions to their source span by sent_idx.
        texts: list[str] = []
        meta: list[tuple] = []  # (doc_id, span_idx, span_offset)
        for doc_id, spans in zip(batch["doc_id"].to_pylist(),
                                 batch["spans"].to_pylist()):
            for si, sp in enumerate(spans or []):
                if sp["kind"] != "text" or not sp["text"]:
                    continue
                texts.append(sp["text"])
                meta.append((doc_id, si, sp["offset"]))
        if texts:
            res = self.model.predict(texts)
            for m in res["mentions"]:
                doc_id, si, span_off = meta[m["sent_idx"]]
                text = texts[m["sent_idx"]]
                s, e = m["start_pos"], m["end_pos"]
                out["doc_id"].append(doc_id)
                out["span_idx"].append(si)
                out["mention"].append(m["text"])
                out["norm_mention"].append(normalize_str(m["text"]))
                out["context_left"].append(text[max(0, s - cw):s])
                out["context_right"].append(text[e:e + cw])
                out["offset"].append(span_off + s)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "span_idx": pa.array(out["span_idx"], pa.int32()),
            "mention": pa.array(out["mention"], pa.string()),
            "norm_mention": pa.array(out["norm_mention"], pa.string()),
            "context_left": pa.array(out["context_left"], pa.string()),
            "context_right": pa.array(out["context_right"], pa.string()),
            "offset": pa.array(out["offset"], pa.int32()),
        })


def ner_mentions(docs: "ray.data.Dataset", factory=None,
                 concurrency: int | tuple = 4,
                 batch_size: int = 256) -> "ray.data.Dataset":
    """NER-driven alternative to extract_mentions: same output schema,
    different proposer (the reference's Flair path vs dict path)."""
    if isinstance(concurrency, int):
        concurrency = (1, max(1, concurrency))
    return docs.map_batches(
        NERMentionStage,
        fn_constructor_kwargs={"factory": factory},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
