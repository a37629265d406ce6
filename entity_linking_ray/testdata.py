"""Deterministic derivation of the interleaved-document corpus + KB from the
driver's testdata tables (TESTDATA.md) — no external data, reproducible at
any sf.

``documents.parquet`` (doc_id:int64, text, lang, source, n_chars) →
interleaved (doc_id:string, spans: list<struct<kind,text,media_ref,offset>>):
the text is chunked into fixed-token text spans, with media spans injected
deterministically from the doc id hash. All tokens are preserved, so
token-level aggregates over the derived corpus stay DuckDB-checkable
against the raw ``documents`` view (the driver's oracle harness).

The derived KB assigns 1-3 entities to each of a fixed subset of the
testdata vocabulary; profiles are deterministic vocabulary bags. This gives
the bench pipeline realistic alias ambiguity at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from . import schemas
from .functions.hashing import fnv1a_64

TOKENS_PER_SPAN = 12
MEDIA_EVERY = 3  # a media span after every 3rd text span (hash-gated)
ALIAS_WORDS = ["spark", "customer", "vector", "stream", "window", "query", "merge", "hash"]
_VOCAB = [
    "the", "fast", "key", "order", "sort", "table", "scan", "part", "small",
    "join", "batch", "dup", "group", "row", "data", "slow", "filter", "line",
    "value", "agg", "column", "big", "a",
]
_MEDIA_KINDS = ["image", "audio", "table"]


def interleave_batch(batch: pa.Table, replicate: int = 1) -> pa.Table:
    """documents batch → interleaved DOCUMENTS schema batch.

    ``replicate`` emits R deterministic copies per source doc with distinct
    doc_ids — used by the benchmark to scale the workload so compute (not
    per-op fixed cost) dominates, without synthesizing new data."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_ids, out_spans = [], []
    for did, text in zip(doc_ids, texts):
        toks = text.split(" ") if text else []
        h = fnv1a_64(str(did).encode())
        spans = []
        offset = 0
        nchunk = 0
        for lo in range(0, len(toks), TOKENS_PER_SPAN):
            chunk = " ".join(toks[lo:lo + TOKENS_PER_SPAN])
            spans.append({"kind": "text", "text": chunk, "media_ref": "", "offset": offset})
            offset += len(chunk) + 1
            nchunk += 1
            if nchunk % MEDIA_EVERY == 0 and (h >> (nchunk % 32)) & 1:
                kind = _MEDIA_KINDS[(h >> 8) % 3]
                spans.append({"kind": kind, "text": "",
                              "media_ref": f"media://{did}/{nchunk}", "offset": offset})
                offset += 1
        for r in range(replicate):
            out_ids.append(f"doc-{did:08d}" if r == 0 else f"doc-{did:08d}-r{r}")
            out_spans.append(spans)
    return pa.table(
        {"doc_id": pa.array(out_ids, pa.string()),
         "spans": pa.array(out_spans, pa.list_(schemas.SPAN_STRUCT))}
    )


def derive_documents(sf_dir: str, replicate: int = 1,
                     num_blocks: int | None = None) -> ray.data.Dataset:
    """``num_blocks``: the testdata parquet is a single file (often a single
    row group → ONE Ray block), which caps every downstream map stage at one
    task. Repartitioning restores task parallelism; real deployments read
    many files and don't need this."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    if num_blocks:
        # split the SLIM source first (cheap row move) so the interleave map
        # parallelizes; batch_size=None → one task per block, so Ray doesn't
        # re-coalesce the small source blocks into a few giant tasks. The
        # interleave output inherits the block count → downstream stages run
        # at full width too.
        ds = ds.repartition(num_blocks)
        return ds.map_batches(
            lambda b: interleave_batch(b, replicate=replicate),
            batch_format="pyarrow", batch_size=None,
        )
    return ds.map_batches(
        lambda b: interleave_batch(b, replicate=replicate), batch_format="pyarrow"
    )


def derive_entities() -> pa.Table:
    """Deterministic KB over the testdata vocabulary: each alias word maps
    to 1-3 entities with distinct vocabulary-bag profiles."""
    rows = []
    eid = 0
    for w in ALIAS_WORDS:
        h = fnv1a_64(w.encode())
        n = 1 + h % 3
        for i in range(n):
            profile = [_VOCAB[(h // (j + 1) + i * 7 + j * 3) % len(_VOCAB)] for j in range(5)]
            rows.append(
                {
                    "entity_id": f"T{eid:05d}",
                    "subject": f"{w} {i}",
                    "aliases": [w],
                    "types": ["Concept"],
                    "infobox": [{"predicate": "profile", "object": " ".join(sorted(set(profile)))}],
                }
            )
            eid += 1
    return pa.Table.from_pylist(rows, schema=schemas.ENTITIES)
