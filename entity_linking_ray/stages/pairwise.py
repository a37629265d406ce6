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

import ray

W_STR = 0.45
W_COS = 0.55
THRESHOLD = 0.62


def score_and_link(batch: pa.Table, w_str: float = W_STR, w_cos: float = W_COS,
                   threshold: float = THRESHOLD) -> pa.Table:
    """candidates (nested) → adds best_entity_id, best_score; rescores the
    nested list in place (score field added per candidate)."""
    cands = batch["cands"].to_pylist()
    best_ids: list[str] = []
    best_scores: list[float] = []
    scored_lists = []
    for entries in cands:
        best_eid, best_s = "NIL", -1.0
        out_entries = []
        for c in entries:
            # float32 BEFORE ranking so the stored score and the tie-break
            # agree (float64-distinct but float32-equal scores must order
            # by entity_id)
            s = float(np.float32(w_str * c["strsim"] + w_cos * min(max(c["cosine"], 0.0), 1.0)))
            c = dict(c)
            c["score"] = s
            out_entries.append(c)
            if s > best_s or (s == best_s and (best_eid == "NIL" or c["entity_id"] < best_eid)):
                best_s = s
                best_eid = c["entity_id"]
        out_entries.sort(key=lambda c: (-c["score"], c["entity_id"]))
        for r, c in enumerate(out_entries):
            c["rank"] = r
        scored_lists.append(out_entries)
        if best_s < threshold:
            best_eid = "NIL"
        best_ids.append(best_eid)
        best_scores.append(best_s)

    scored_struct = pa.struct(
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
    out = batch.drop_columns(["cands"])
    out = out.append_column("cands", pa.array(scored_lists, pa.list_(scored_struct)))
    out = out.append_column("entity_id", pa.array(best_ids, pa.string()))
    out = out.append_column("best_score", pa.array(np.array(best_scores, np.float32)))
    return out


def link_mentions(scored: "ray.data.Dataset") -> "ray.data.Dataset":
    """Projection to the LINKS logical table."""
    return scored.select_columns(
        ["doc_id", "span_idx", "offset", "entity_id", "best_score"]
    ).rename_columns(["doc_id", "span_idx", "offset", "entity_id", "score"])


def explode_scored_pairs(scored: "ray.data.Dataset") -> "ray.data.Dataset":
    """Nested candidates → flat SCORED_PAIRS rows (reporting/eval table)."""

    def explode(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "span_idx": [], "offset": [], "entity_id": [],
               "score": [], "rank": [], "source": []}
        for doc_id, si, off, entries in zip(
            batch["doc_id"].to_pylist(), batch["span_idx"].to_pylist(),
            batch["offset"].to_pylist(), batch["cands"].to_pylist(),
        ):
            for c in entries:
                out["doc_id"].append(doc_id)
                out["span_idx"].append(si)
                out["offset"].append(off)
                out["entity_id"].append(c["entity_id"])
                out["score"].append(c["score"])
                out["rank"].append(c["rank"])
                out["source"].append(c["source"])
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "span_idx": pa.array(out["span_idx"], pa.int32()),
                "offset": pa.array(out["offset"], pa.int32()),
                "entity_id": pa.array(out["entity_id"], pa.string()),
                "score": pa.array(out["score"], pa.float32()),
                "rank": pa.array(out["rank"], pa.int32()),
                "source": pa.array(out["source"], pa.string()),
            }
        )

    return scored.map_batches(explode, batch_format="pyarrow")
