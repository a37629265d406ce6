"""Explicit Arrow schemas for every logical table.

The reference is schema-on-read (dicts mutated in place, SURVEY.md §1.3);
this engine instead fixes one ``pyarrow.Schema`` per logical table and
validates at stage boundaries.

Reference shapes these derive from (file:line into /root/reference):
- documents: ``entity_sort/data/train.json:1`` ``{"text_id","text","mention_data"}``
  re-expressed as the interleaved text+media layout from BASELINE.json
  ``input_hint``.
- mentions:  ``entity_candidate/main_dense.py:80-95`` mention dicts.
- entities:  ``entity_sort/el_process.py:28-44`` CCKS kb_data rows.
- candidates/scored_pairs: ``entity_sort/el_main.py:599-658``.
"""

from __future__ import annotations

import pyarrow as pa

# One span of an interleaved document. kind in {"text","image","audio",
# "table"}; media_ref == "" for text spans, text == "" for media spans;
# offset strictly increasing within a document (char offset, not bytes —
# CJK-safe per reference tokenization.py:217-240 semantics).
SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOCUMENTS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

ENTITIES = pa.schema(
    [
        pa.field("entity_id", pa.string()),
        pa.field("subject", pa.string()),
        pa.field("aliases", pa.list_(pa.string())),
        pa.field("types", pa.list_(pa.string())),
        pa.field(
            "infobox",
            pa.list_(
                pa.struct(
                    [
                        pa.field("predicate", pa.string()),
                        pa.field("object", pa.string()),
                    ]
                )
            ),
        ),
    ]
)

MENTIONS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("mention", pa.string()),        # raw surface form
        pa.field("norm_mention", pa.string()),   # normalized (blocking key input)
        pa.field("context_left", pa.string()),
        pa.field("context_right", pa.string()),
        pa.field("offset", pa.int32()),          # char offset within the doc
    ]
)

ALIAS_INDEX = pa.schema(
    [
        pa.field("norm_alias", pa.string()),
        pa.field("entity_id", pa.string()),
    ]
)

CANDIDATES = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("entity_id", pa.string()),
        pa.field("source", pa.string()),             # "exact" | "ann"
        pa.field("retrieval_score", pa.float32()),
        pa.field("rank", pa.int32()),
    ]
)

# nested per-mention candidate struct AFTER scoring (pairwise.score_and_link
# appends score + rank to the retrieval-time CAND fields)
CAND_SCORED_STRUCT = pa.struct(
    [
        pa.field("entity_id", pa.string()),
        pa.field("source", pa.string()),
        pa.field("retrieval_score", pa.float32()),
        pa.field("strsim", pa.float32()),
        pa.field("cosine", pa.float32()),
        pa.field("score", pa.float32()),
        pa.field("rank", pa.int32()),
    ]
)

SCORED = pa.schema(
    list(MENTIONS)
    + [
        pa.field("cands", pa.list_(CAND_SCORED_STRUCT)),
        pa.field("entity_id", pa.string()),  # best link or "NIL"
        pa.field("best_score", pa.float32()),
    ]
)

SCORED_PAIRS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("offset", pa.int32()),
        pa.field("entity_id", pa.string()),
        pa.field("score", pa.float32()),
        pa.field("rank", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

LINKS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("offset", pa.int32()),
        pa.field("entity_id", pa.string()),  # "NIL" when no accepted candidate
        pa.field("score", pa.float32()),
        pa.field("node", pa.int64()),        # 63-bit mention node hash
    ]
)

CLUSTERS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("offset", pa.int32()),
        pa.field("cluster_id", pa.string()),
    ]
)

ANNOTATED_DOCUMENTS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),  # byte-identical pass-through
        pa.field("n_mentions", pa.int64()),
        pa.field("n_linked", pa.int64()),
    ]
)

MENTIONS_GOLD = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("mention", pa.string()),
        pa.field("entity_id", pa.string()),  # "NIL" allowed
        pa.field("offset", pa.int32()),      # char offset within the doc
    ]
)


def validate(table: pa.Table, schema: pa.Schema, name: str = "table") -> pa.Table:
    """Cast-or-raise boundary validation (replaces the reference's ad-hoc
    dict mutation with an explicit contract)."""
    try:
        return table.select(schema.names).cast(schema)
    except (KeyError, pa.ArrowInvalid, pa.ArrowTypeError) as exc:  # pragma: no cover
        raise ValueError(f"{name} does not match schema {schema}: {exc}") from exc
