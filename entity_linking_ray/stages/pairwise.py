"""Pairwise scoring + link decision (the reference's A5 decision function,
re-expressed as a deterministic calibrated combination).

Reference: BertForEntityLinking emits softmax P(match) per
(mention, candidate) pair; per-mention sort desc; best candidate wins
(``el_models.py:12-95``; ``el_main.py:617-658``; ``service_main.py:146-172``).

Here: score = W_STR * strsim + W_COS * clip(cosine, 0, 1), candidates were
produced with both features attached; link = argmax with the stable
tie-break (score desc, entity_id asc — SURVEY.md §7 hard-part 3); mentions
whose best score < THRESHOLD link to "NIL" (the NIL behavior of the
reference's labeled data). All row-local: pure ``map_batches``, no shuffle.

A trained model drops in by replacing :func:`score_candidates` with an
actor-pool stage of the same signature (see stages/ann.py docstring).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

W_STR = 0.45
W_COS = 0.55
THRESHOLD = 0.62


def score_and_link(batch: pa.Table, w_str: float = W_STR, w_cos: float = W_COS,
                   threshold: float = THRESHOLD) -> pa.Table:
    """candidates (nested) → adds entity_id (best link or NIL), best_score;
    rescores + ranks the nested list in place.

    Fully vectorized over the Arrow list<struct> CHILD arrays — no
    per-candidate Python objects (the dict-per-candidate version saturated
    the allocator under task concurrency and anti-scaled). Tie-break is
    (score desc, entity_id asc) with score in float32 so stored values and
    ordering agree.
    """
    lst = batch["cands"].combine_chunks()
    n = batch.num_rows
    raw_offsets = lst.offsets.to_numpy().astype(np.int64)
    offsets = raw_offsets - raw_offsets[0]  # normalize sliced arrays
    counts = np.diff(offsets)
    vals = lst.flatten()  # struct children, flattened across all mentions
    m = len(vals)

    strsim = vals.field("strsim").to_numpy(zero_copy_only=False)
    cosine = vals.field("cosine").to_numpy(zero_copy_only=False)
    score = (w_str * strsim + w_cos * np.clip(cosine, 0.0, 1.0)).astype(np.float32)

    # lexicographic entity rank WITHOUT materializing python strings:
    # dictionary-encode, sort the (small) dictionary, map codes → ranks
    eids = vals.field("entity_id")
    dct = pc.dictionary_encode(eids)
    codes = dct.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = np.asarray(dct.dictionary.to_pylist(), dtype=object)
    rank_of_code = np.empty(len(dictionary), dtype=np.int64)
    rank_of_code[np.argsort(dictionary)] = np.arange(len(dictionary))
    eid_rank = rank_of_code[codes]

    seg = np.repeat(np.arange(n, dtype=np.int64), counts)
    order = np.lexsort((eid_rank, -score.astype(np.float64), seg))
    ranks = (np.arange(m, dtype=np.int64) - np.repeat(offsets[:-1], counts)).astype(np.int32)

    perm = pa.array(order, pa.int64())
    sorted_struct = pa.StructArray.from_arrays(
        [
            eids.take(perm),
            vals.field("source").take(perm),
            vals.field("retrieval_score").take(perm),
            vals.field("strsim").take(perm),
            vals.field("cosine").take(perm),
            pa.array(score[order], pa.float32()),
            pa.array(ranks, pa.int32()),
        ],
        names=["entity_id", "source", "retrieval_score", "strsim", "cosine", "score", "rank"],
    )
    scored_list = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), sorted_struct)

    # best per mention = first element of each non-empty sorted segment
    has_cands = counts > 0
    if m == 0:
        # whole batch is candidate-less (ann_k=0 / empty KB / no alias or
        # ANN hits): every mention is NIL — the gathers below would index
        # into empty arrays
        best_score = np.full(n, -1.0, dtype=np.float32)
        entity_id = pa.array(["NIL"] * n, pa.string())
    else:
        starts = offsets[:-1]
        best_idx = np.where(has_cands, starts, 0)
        best_score = np.where(has_cands, score[order][best_idx], -1.0).astype(np.float32)
        best_eids = eids.take(perm).take(pa.array(best_idx, pa.int64()))
        accept = pa.array(has_cands & (best_score >= threshold))
        entity_id = pc.if_else(accept, best_eids, pa.scalar("NIL"))

    out = batch.drop_columns(["cands"])
    out = out.append_column("cands", scored_list)
    out = out.append_column("entity_id", pc.cast(entity_id, pa.string()))
    out = out.append_column("best_score", pa.array(best_score))
    return out


def mention_node_hashes(batch: pa.Table) -> np.ndarray:
    """63-bit node id per mention, vectorized: string hashing only over the
    DISTINCT doc_ids in the batch; span_idx/offset mixed in numerically."""
    from ..functions.hashing import hash_strings, splitmix64

    dct = pc.dictionary_encode(batch["doc_id"].combine_chunks())
    inv = dct.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = dct.dictionary.to_pylist()
    dh = hash_strings(uniq).astype(np.uint64)[inv]
    si = batch["span_idx"].to_numpy(zero_copy_only=False).astype(np.uint64)
    off = batch["offset"].to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        mix = splitmix64(si * np.uint64(0x9E3779B97F4A7C15)
                         + off * np.uint64(0xC2B2AE3D27D4EB4F) + np.uint64(1))
    node = splitmix64(dh ^ mix) & np.uint64(0x7FFFFFFFFFFFFFFF)
    return node.astype(np.int64)


def link_mentions(scored: "ray.data.Dataset") -> "ray.data.Dataset":
    """Projection to the LINKS logical table + the mention node hash
    (computed ONCE here; edge build and cluster attach both reuse it)."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"], "span_idx": batch["span_idx"],
            "offset": batch["offset"], "entity_id": batch["entity_id"],
            "score": batch["best_score"],
            "node": pa.array(mention_node_hashes(batch), pa.int64()),
        })

    return scored.map_batches(project, batch_format="pyarrow")


def explode_scored_pairs(scored: "ray.data.Dataset") -> "ray.data.Dataset":
    """Nested candidates → flat SCORED_PAIRS rows (reporting/eval table).
    Vectorized: parent keys repeated by list length via Arrow take."""

    def explode(batch: pa.Table) -> pa.Table:
        lst = batch["cands"].combine_chunks()
        raw_offsets = lst.offsets.to_numpy().astype(np.int64)
        counts = np.diff(raw_offsets - raw_offsets[0])
        vals = lst.flatten()
        parent = pa.array(
            np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts), pa.int64()
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(parent),
                "span_idx": batch["span_idx"].take(parent),
                "offset": batch["offset"].take(parent),
                "entity_id": vals.field("entity_id"),
                "score": vals.field("score"),
                "rank": vals.field("rank"),
                "source": vals.field("source"),
            }
        )

    return scored.map_batches(explode, batch_format="pyarrow")
