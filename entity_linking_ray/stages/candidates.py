"""Candidate generation: exact alias lookup ∪ ANN top-k with precedence.

Reference semantics being reproduced:
- J1 exact-match blocking join: mention surface → entity ids
  (``service_main.py:117-123``, ``el_main.py:122-127``).
- J7 dense top-k retrieval (``el_main.py:575-580``).
- J8 precedence merge: exact-match candidates win; ANN ids fill the
  remaining top-k slots, skipping ids already present
  (``el_main.py:599-615`` — exact candidates displace the ANN tail).

Ray shape: ONE actor-pool map_batches stage over mentions. Actor state
(alias dict + entity embedding matrix + per-entity alias lists for string
features) comes from a single ``ray.put`` broadcast, read zero-copy in
``__init__``. Per batch everything is vectorized except the per-mention
candidate assembly loop (bounded by k).

Output is NESTED — one row per mention with a ``cands``
list<struct<entity_id, source, retrieval_score, strsim, cosine>> column —
so per-mention scoring/argmax downstream is row-local (no shuffle), which
is what keeps the link step narrow at 10^12-doc scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..functions.embed import DEFAULT_DIM, embed_texts
from ..functions.normalize import normalize_str
from ..functions.strsim import jaro_winkler, levenshtein_ratio

CAND_STRUCT = pa.struct(
    [
        pa.field("entity_id", pa.string()),
        pa.field("source", pa.string()),
        pa.field("retrieval_score", pa.float32()),
        pa.field("strsim", pa.float32()),
        pa.field("cosine", pa.float32()),
    ]
)


def make_kb_blob(entities_tbl: pa.Table, dim: int = DEFAULT_DIM):
    """Driver-side: build the broadcastable KB blob once.

    Returns dict with: alias→[eid] dict, eid→row index, ids ndarray,
    embedding matrix, eid→normalized alias list (for string features).
    """
    from .alias_index import explode_aliases
    from .ann import entity_embedding_blob

    ids, matrix = entity_embedding_blob(entities_tbl, dim=dim)
    exploded = explode_aliases(entities_tbl)
    alias_to_ids: dict[str, list[str]] = {}
    eid_aliases: dict[str, list[str]] = {}
    for a, e in zip(exploded["norm_alias"].to_pylist(), exploded["entity_id"].to_pylist()):
        alias_to_ids.setdefault(a, []).append(e)
        eid_aliases.setdefault(e, []).append(a)
    for a in alias_to_ids:
        alias_to_ids[a] = sorted(set(alias_to_ids[a]))
    row_of = {e: i for i, e in enumerate(ids)}
    subjects = {e: normalize_str(s) for e, s in
                zip(entities_tbl["entity_id"].to_pylist(), entities_tbl["subject"].to_pylist())}
    return {
        "alias_to_ids": alias_to_ids,
        "eid_aliases": eid_aliases,
        "subjects": subjects,
        "ids": ids,
        "matrix": matrix,
        "row_of": row_of,
        "dim": dim,
    }


class CandidateGenerator:
    """map_batches actor: mentions → nested candidates with features."""

    def __init__(self, kb_blob, k: int = 10, ann_k: int = 5, dim: int | None = None):
        if isinstance(kb_blob, ray.ObjectRef):
            kb_blob = ray.get(kb_blob)
        self.kb = kb_blob
        self.k = k
        self.ann_k = ann_k
        self.dim = dim or kb_blob["dim"]
        self._strsim_cache: dict[tuple[str, str], float] = {}

    def _strsim(self, norm_mention: str, eid: str) -> float:
        key = (norm_mention, eid)
        v = self._strsim_cache.get(key)
        if v is None:
            best = 0.0
            names = self.kb["eid_aliases"].get(eid, []) + [self.kb["subjects"].get(eid, "")]
            for a in names:
                if not a:
                    continue
                s = 0.5 * (jaro_winkler(norm_mention, a) + levenshtein_ratio(norm_mention, a))
                if s > best:
                    best = s
                    if best >= 0.999:
                        break
            self._strsim_cache[key] = v = best
            if len(self._strsim_cache) > 200_000:
                self._strsim_cache.clear()
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        norm = batch["norm_mention"].to_pylist()
        ctx_l = batch["context_left"].to_pylist()
        ctx_r = batch["context_right"].to_pylist()
        # context-only embedding (M5 analogue) — the surface form itself is
        # EXCLUDED so cosine measures contextual agreement, not the trivial
        # alias overlap (which strsim already captures); mirrors the
        # reference scoring context vs candidate *description* (A5).
        texts = [f"{l} {r}" for l, r in zip(ctx_l, ctx_r)]
        Q = embed_texts(texts, dim=self.dim)  # [n, d] row-normalized

        # dense scores against the whole (broadcast) matrix
        M = self.kb["matrix"]
        ids = self.kb["ids"]
        scores = Q @ M.T  # [n, m]
        ann_k = min(self.ann_k, len(ids))
        if ann_k > 0:
            part = np.argpartition(-scores, ann_k - 1, axis=1)[:, :ann_k]
        else:
            part = np.empty((n, 0), dtype=np.int64)

        cands_col = []
        row_of = self.kb["row_of"]
        for i in range(n):
            m_norm = norm[i]
            exact = self.kb["alias_to_ids"].get(m_norm, [])
            if len(exact) > self.k:
                # hot block: keep the k exact candidates ranked by context
                # cosine (desc, entity_id asc) so gold survives truncation —
                # the reference's per-alias rescoring analogue
                # (el_main.py:113-180 _run_biencoder_test).
                rows = np.array([row_of.get(e, -1) for e in exact])
                cos_all = np.where(rows >= 0, scores[i, rows], -1.0)
                order = np.lexsort((np.array(exact, dtype=object), -cos_all))
                exact = [exact[j] for j in order[: self.k]]
            entries = []
            seen = set()
            for eid in exact:
                r = row_of.get(eid)
                cos = float(scores[i, r]) if r is not None else 0.0
                entries.append(
                    {"entity_id": eid, "source": "exact", "retrieval_score": 1.0,
                     "strsim": self._strsim(m_norm, eid), "cosine": cos})
                seen.add(eid)
            if len(entries) < self.k and ann_k > 0:
                cand_rows = part[i]
                order = np.lexsort((ids[cand_rows], -scores[i, cand_rows]))
                for j in cand_rows[order]:
                    eid = ids[j]
                    if eid in seen:
                        continue
                    entries.append(
                        {"entity_id": eid, "source": "ann",
                         "retrieval_score": float(scores[i, j]),
                         "strsim": self._strsim(m_norm, eid),
                         "cosine": float(scores[i, j])})
                    seen.add(eid)
                    if len(entries) >= self.k:
                        break
            cands_col.append(entries)

        return batch.append_column("cands", pa.array(cands_col, pa.list_(CAND_STRUCT)))


def generate_candidates(mentions: "ray.data.Dataset", kb_blob_ref,
                        k: int = 10, ann_k: int = 5,
                        concurrency: int | tuple = 4, batch_size: int = 1024) -> "ray.data.Dataset":
    if isinstance(concurrency, int):
        concurrency = (1, max(1, concurrency))
    return mentions.map_batches(
        CandidateGenerator,
        fn_constructor_kwargs={"kb_blob": kb_blob_ref, "k": k, "ann_k": ann_k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
