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
import pyarrow.compute as pc

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
    order = np.argsort(ids)
    ids, matrix = ids[order], matrix[order]  # id-ascending: column order IS
    # the tie-break order for stable argsort in the ANN top-k
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
    # lexical channel index (reference Solr path, main_solr.py:127-137:
    # title + aliases + description fields): per-entity token set over
    # subject ∪ aliases ∪ synthesized description, in matrix-row order so
    # score_batch entity rows index straight into ids/matrix
    from ..functions.describe import synthesize_description
    from .lexical import build_lexical_index

    by_eid = {}
    for e, s, al, ib in zip(entities_tbl["entity_id"].to_pylist(),
                            entities_tbl["subject"].to_pylist(),
                            entities_tbl["aliases"].to_pylist(),
                            entities_tbl["infobox"].to_pylist()
                            if "infobox" in entities_tbl.schema.names
                            else [[]] * entities_tbl.num_rows):
        desc = synthesize_description(s, list(ib or []))
        by_eid[e] = normalize_str(" ".join([s, *list(al or []), desc]))
    lex_index = build_lexical_index(
        np.arange(len(ids), dtype=np.int64),
        [by_eid.get(e, "") for e in ids], tokenizer="rough")
    return {
        "alias_to_ids": alias_to_ids,
        "eid_aliases": eid_aliases,
        "subjects": subjects,
        "ids": ids,
        "matrix": matrix,
        "row_of": row_of,
        "dim": dim,
        "lex_index": lex_index,
    }


class CandidateGenerator:
    """map_batches actor: mentions → nested candidates with features."""

    def __init__(self, kb_blob, k: int = 10, ann_k: int = 5, dim: int | None = None,
                 lex_k: int = 0):
        if isinstance(kb_blob, ray.ObjectRef):
            kb_blob = ray.get(kb_blob)
        self.kb = kb_blob
        self.k = k
        self.ann_k = ann_k
        self.lex_k = lex_k  # lexical-channel fill width (0 = off)
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
        """Vectorized candidate assembly.

        The per-candidate work (exact lookup, ANN top-k, J8 precedence
        dedup, feature gather) runs as whole-batch numpy array ops; Python
        loops remain only over (a) DISTINCT surface forms in the batch,
        (b) distinct (surface, entity) pairs for the cached string
        similarity, and (c) hot-surface mentions (exact list > k — the
        per-mention cosine-ranked truncation, reference analogue
        el_main.py:113-180)."""
        n = batch.num_rows
        kb = self.kb
        ids = kb["ids"]          # object ndarray, ascending
        M = kb["matrix"]
        m = len(ids)
        k = self.k
        ann_k = min(self.ann_k, m)

        empty_struct = pa.StructArray.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.string()),
             pa.array([], pa.float32()), pa.array([], pa.float32()),
             pa.array([], pa.float32())],
            names=["entity_id", "source", "retrieval_score", "strsim", "cosine"],
        )
        if n == 0:
            return batch.append_column(
                "cands", pa.ListArray.from_arrays(pa.array([0], pa.int32()), empty_struct))

        norm = np.asarray(batch["norm_mention"].to_pylist(), dtype=object)
        ctx_l = batch["context_left"].to_pylist()
        ctx_r = batch["context_right"].to_pylist()
        # context-only embedding (M5 analogue) — the surface form itself is
        # EXCLUDED so cosine measures contextual agreement, not the trivial
        # alias overlap (which strsim already captures); mirrors the
        # reference scoring context vs candidate *description* (A5).
        texts = [f"{l} {r}" for l, r in zip(ctx_l, ctx_r)]
        Q = embed_texts(texts, dim=self.dim)
        scores = Q @ M.T  # [n, m] float32

        uniq, inv = np.unique(norm, return_inverse=True)
        u = len(uniq)
        row_of = kb["row_of"]
        exact_rows_list: list[np.ndarray] = []
        hot_u = np.zeros(u, dtype=bool)
        for j in range(u):
            eids = kb["alias_to_ids"].get(uniq[j], [])
            rows = np.array([row_of[e] for e in eids if e in row_of], dtype=np.int64)
            exact_rows_list.append(rows)
            hot_u[j] = len(rows) > k

        e_sizes = np.array(
            [0 if hot_u[j] else len(exact_rows_list[j]) for j in range(u)], dtype=np.int64)
        hot_m = hot_u[inv]

        # ---- cold exact part: surface-major repeat/tile (aligned arrays)
        cold_idx = np.nonzero(~hot_m)[0]
        inv_cold = inv[cold_idx]
        order_c = np.argsort(inv_cold, kind="stable")
        ms = cold_idx[order_c]
        cnt_per_u = np.bincount(inv_cold, minlength=u)
        rep_counts = e_sizes[inv_cold[order_c]]
        midx_e = np.repeat(ms, rep_counts)
        tiles = [np.tile(exact_rows_list[j], cnt_per_u[j])
                 for j in range(u) if cnt_per_u[j] > 0 and e_sizes[j] > 0]
        ent_e = np.concatenate(tiles) if tiles else np.empty(0, dtype=np.int64)

        # ---- ANN part with J8 precedence dedup (vectorized)
        if ann_k > 0:
            if m <= 128:
                A = np.argsort(-scores, kind="stable", axis=1)[:, :ann_k]
            else:
                topc = np.argpartition(-scores, ann_k - 1, axis=1)[:, :ann_k]
                A = np.empty_like(topc)
                for i in range(n):  # small fixed-k per-row refine
                    c = topc[i]
                    A[i] = c[np.lexsort((c, -scores[i, c]))]
            max_e = int(e_sizes.max()) if u else 0
            if max_e > 0:
                P = np.full((u, max_e), -1, dtype=np.int64)
                for j in range(u):
                    if e_sizes[j] > 0:
                        P[j, : e_sizes[j]] = exact_rows_list[j]
                dup = (A[:, :, None] == P[inv][:, None, :]).any(axis=2)
            else:
                dup = np.zeros_like(A, dtype=bool)
            room = np.clip(k - e_sizes[inv], 0, None)
            room[hot_m] = 0
            valid = ~dup
            keep = valid & (np.cumsum(valid, axis=1) <= room[:, None])
            ann_counts = keep.sum(axis=1).astype(np.int64)
            midx_a = np.repeat(np.arange(n, dtype=np.int64), ann_counts)
            ent_a = A[keep]
        else:
            midx_a = np.empty(0, dtype=np.int64)
            ent_a = np.empty(0, dtype=np.int64)

        # ---- hot mentions: per-mention cosine-ranked exact truncation
        hot_idx = np.nonzero(hot_m)[0]
        if len(hot_idx):
            h_mi, h_ent = [], []
            for i in hot_idx:
                rows = exact_rows_list[inv[i]]
                cos = scores[i, rows]
                sel = rows[np.lexsort((ids[rows], -cos))[:k]]
                h_mi.append(np.full(len(sel), i, dtype=np.int64))
                h_ent.append(sel)
            midx_h = np.concatenate(h_mi)
            ent_h = np.concatenate(h_ent)
        else:
            midx_h = np.empty(0, dtype=np.int64)
            ent_h = np.empty(0, dtype=np.int64)

        # ---- lexical channel (flag 2, reference Solr path): description-
        # token idf scores fill whatever room exact+ann left, skipping
        # entities already selected (J8 precedence extended one rank down)
        midx_l = np.empty(0, dtype=np.int64)
        ent_l = np.empty(0, dtype=np.int64)
        lexs_l = np.empty(0, dtype=np.float32)
        if self.lex_k > 0 and "lex_index" in kb:
            from ..functions.normalize import normalize_array
            from .lexical import IDF_SCALE, score_batch, tokenize_rough

            rows_l, toks_l = tokenize_rough(
                normalize_array(pa.array(texts, pa.string())))
            lq, le, ls, _ = score_batch(kb["lex_index"], rows_l, toks_l,
                                        min(self.lex_k, m))
            if len(lq):
                prior_m = np.concatenate([midx_e, midx_h, midx_a])
                prior_e = np.concatenate([ent_e, ent_h, ent_a])
                codes = lq * m + le
                if len(prior_m):
                    sel = np.sort(prior_m * m + prior_e)
                    p = np.searchsorted(sel, codes)
                    p_cl = np.minimum(p, len(sel) - 1)
                    dup = (p < len(sel)) & (sel[p_cl] == codes)
                else:
                    dup = np.zeros(len(codes), bool)
                room2 = np.clip(k - np.bincount(prior_m, minlength=n),
                                0, None)
                valid = ~dup
                # segment-limited fill: per mention, first room2 valid
                # rows in score order (score_batch emits (q, rn)-sorted)
                excl = np.cumsum(valid) - valid
                newq = np.ones(len(lq), bool)
                newq[1:] = lq[1:] != lq[:-1]
                qstarts = np.nonzero(newq)[0]
                seg = np.cumsum(newq) - 1
                within = excl - excl[qstarts][seg]
                keepl = valid & (within < room2[lq])
                midx_l, ent_l = lq[keepl], le[keepl]
                lexs_l = (ls[keepl].astype(np.float64)
                          / IDF_SCALE).astype(np.float32)

        # ---- assemble: exact (incl. hot), then ann, then lexical —
        # stable within groups
        midx = np.concatenate([midx_e, midx_h, midx_a, midx_l])
        ent = np.concatenate([ent_e, ent_h, ent_a, ent_l])
        flag = np.concatenate([
            np.zeros(len(midx_e) + len(midx_h), dtype=np.int8),
            np.ones(len(midx_a), dtype=np.int8),
            np.full(len(midx_l), 2, dtype=np.int8),
        ])
        lexv = np.concatenate([
            np.zeros(len(midx_e) + len(midx_h) + len(midx_a), np.float32),
            lexs_l,
        ])
        order = np.lexsort((flag, midx))
        midx_f, ent_f, flag_f = midx[order], ent[order], flag[order]
        lexv_f = lexv[order]

        counts = np.bincount(midx, minlength=n)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])

        cos_f = scores[midx_f, ent_f].astype(np.float32)
        retrieval_f = np.where(flag_f == 0, np.float32(1.0),
                               np.where(flag_f == 2, lexv_f, cos_f))

        # strsim over DISTINCT (surface, entity) pairs only, then gather
        pair_codes = inv[midx_f] * m + ent_f
        up_codes, uinv_p = np.unique(pair_codes, return_inverse=True)
        sv = np.empty(len(up_codes), dtype=np.float32)
        for t in range(len(up_codes)):
            j, r = divmod(int(up_codes[t]), m)
            sv[t] = self._strsim(uniq[j], ids[r])
        strsim_f = sv[uinv_p]

        src_f = np.where(flag_f == 0, "exact",
                         np.where(flag_f == 2, "lexical", "ann"))
        struct = pa.StructArray.from_arrays(
            [
                pa.array(ids[ent_f], pa.string()),
                pa.array(src_f, pa.string()),
                pa.array(retrieval_f),
                pa.array(strsim_f),
                pa.array(cos_f),
            ],
            names=["entity_id", "source", "retrieval_score", "strsim", "cosine"],
        )
        cands = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
        return batch.append_column("cands", cands)


_TASK_GENERATORS: dict = {}


def generate_candidates(mentions: "ray.data.Dataset", kb_blob_ref,
                        k: int = 10, ann_k: int = 5, lex_k: int = 0,
                        concurrency: int | tuple = 4, batch_size: int = 1024,
                        pool: str = "actor") -> "ray.data.Dataset":
    if pool == "actor":
        if isinstance(concurrency, int):
            concurrency = (1, max(1, concurrency))
        return mentions.map_batches(
            CandidateGenerator,
            fn_constructor_kwargs={"kb_blob": kb_blob_ref, "k": k,
                                   "ann_k": ann_k, "lex_k": lex_k},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    # task pool with worker-process-level generator cache (see
    # mentions.extract_mentions for rationale)
    key = (kb_blob_ref.hex() if hasattr(kb_blob_ref, "hex") else str(kb_blob_ref),
           k, ann_k, lex_k)

    def gen(batch: pa.Table) -> pa.Table:
        g = _TASK_GENERATORS.get(key)
        if g is None:
            g = CandidateGenerator(kb_blob_ref, k=k, ann_k=ann_k, lex_k=lex_k)
            _TASK_GENERATORS.clear()
            _TASK_GENERATORS[key] = g
        return g(batch)

    return mentions.map_batches(gen, batch_format="pyarrow", batch_size=batch_size)
