"""Lexical (BM25-style) candidate retrieval over an inverted token index.

The reference's third retrieval channel queries a Solr index of entity
titles/aliases/descriptions and boosts by popularity
(``entity_candidate/candidate_generators.py:59-116``; query template and
``log(sum(num_incoming_links,1))`` boost in ``main_solr.py:127-143``).
This module re-expresses it Ray-Data-first and DETERMINISTICALLY so the
scores carry an exact DuckDB oracle:

    score(query, entity) = Σ over DISTINCT shared tokens t of
                           idf_units(t),
    idf_units(t) = round(ln(N_entities / df(t)) · 1e6) as int64,
    df(t)        = number of entities whose token set contains t.

Set-semantics BM25-without-tf: integer sums are order-independent
(hash-stable vs SQL), and dropping tf removes the per-document length
normalization that is not SQL-expressible deterministically. Popularity
boosting stays a separate additive join (the oracled `part_link_boost`
query), exactly like the reference applies it post-retrieval.

Two plans, same output (equivalence-tested):

- **broadcast** (default): the entity index — vocab array, CSR postings,
  idf units — is built once driver-side (entities ≪ corpus; the same
  small-side shape as the flagship KB blob, stages/candidates.py) and
  ``ray.put`` once; every batch scores ALL its query docs with pure
  numpy (searchsorted vocab probe → posting expand → segment top-k) and
  emits only (query_id, entity_id, score_units, rn ≤ k) rows. No
  shuffle at all — the scale path while the index fits a worker heap.
- **join** (past ``broadcast_token_cap`` postings): distinct query
  tokens ⋈ posting rows on token (distributed hash join), per-pair
  int64 groupby-sum, then `rank.topn_per_group` — the classic sparse
  retrieval dataflow when the index itself is distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

IDF_SCALE = 1_000_000


def tokenize_column(col: pa.ChunkedArray | pa.Array,
                    pattern: str = " ") -> tuple[np.ndarray, np.ndarray]:
    """→ (row_idx, token) flat arrays, empty tokens dropped — the same
    split rule as DuckDB ``string_split(x, ' ')`` filtered on ``<> ''``."""
    toks = pc.split_pattern(col, pattern)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    rows = np.repeat(np.arange(len(col), dtype=np.int64),
                     lens.astype(np.int64))
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return rows[keep], flat.filter(pa.array(keep)).to_numpy(
        zero_copy_only=False)


_ROUGH_SEP = r"[^0-9a-z一-鿿]+"


def tokenize_rough(col) -> tuple[np.ndarray, np.ndarray]:
    """→ (row_idx, token) with word tokens = runs of [0-9a-z CJK] —
    the flagship-channel tokenizer (descriptions carry punctuation glued
    to words; the plain space split would miss them). Vectorized: one
    RE2 replace collapses separators to spaces, then the space split."""
    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(list(col), pa.string())
    cleaned = pc.replace_substring_regex(col, pattern=_ROUGH_SEP,
                                         replacement=" ")
    return tokenize_column(cleaned)


def build_lexical_index(entity_ids: np.ndarray, texts,
                        pattern: str = " ",
                        tokenizer: str = "space") -> dict:
    """Driver-side inverted index: DISTINCT (entity, token) postings in
    CSR-by-token form + exact fixed-point idf units. ``texts`` is any
    sequence of strings aligned with ``entity_ids``; ``tokenizer``
    "space" (SQL-parity split) or "rough" (word runs — the flagship
    channel)."""
    col = pa.array(list(texts), pa.string())
    rows, toks = (tokenize_rough(col) if tokenizer == "rough"
                  else tokenize_column(col, pattern))
    if len(rows) == 0:
        return {"vocab": np.empty(0, object), "starts": np.empty(0, np.int64),
                "counts": np.empty(0, np.int64),
                "post_rows": np.empty(0, np.int64),
                "units": np.empty(0, np.int64),
                "entity_ids": np.asarray(entity_ids),
                "n_entities": len(entity_ids)}
    # distinct (token, entity) pairs, grouped by token
    order = np.lexsort((rows, toks))
    toks, rows = toks[order], rows[order]
    keep = np.ones(len(toks), bool)
    keep[1:] = (toks[1:] != toks[:-1]) | (rows[1:] != rows[:-1])
    toks, rows = toks[keep], rows[keep]
    new = np.ones(len(toks), bool)
    new[1:] = toks[1:] != toks[:-1]
    starts = np.nonzero(new)[0].astype(np.int64)
    vocab = toks[starts]
    counts = np.diff(np.append(starts, len(toks))).astype(np.int64)
    n = len(entity_ids)
    # DuckDB round() is half-away-from-zero — use the Arrow kernel, not
    # np.round (half-even), for exact oracle parity (memory: fixed-point
    # idioms)
    idf = pc.cast(pc.round(
        pc.multiply(pc.ln(pc.divide(pa.scalar(float(n)),
                                    pa.array(counts.astype(np.float64)))),
                    pa.scalar(float(IDF_SCALE))),
        round_mode="half_towards_infinity"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    return {"vocab": vocab, "starts": starts, "counts": counts,
            "post_rows": rows, "units": idf,
            "entity_ids": np.asarray(entity_ids), "n_entities": n}


def _expand(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    base = np.repeat(starts - np.concatenate(
        [[np.int64(0)], np.cumsum(counts)[:-1]]), counts)
    return base + np.arange(total, dtype=np.int64)


def score_batch(index: dict, q_rows: np.ndarray, q_tokens: np.ndarray,
                k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray]:
    """Vectorized batch scorer: (query row, token) flat pairs → per-query
    top-k (q_row, entity_row, score_units, rn). Pure numpy — the hot
    kernel shared by the broadcast operator and the flagship channel."""
    vocab = index["vocab"]
    if len(q_rows) == 0 or len(vocab) == 0:
        z = np.empty(0, np.int64)
        return z, z, z, z
    # distinct (query, token) then vocab probe
    order = np.lexsort((q_rows, q_tokens))
    qt, qr = q_tokens[order], q_rows[order]
    keep = np.ones(len(qt), bool)
    keep[1:] = (qt[1:] != qt[:-1]) | (qr[1:] != qr[:-1])
    qt, qr = qt[keep], qr[keep]
    tid = np.searchsorted(vocab, qt)
    ok = tid < len(vocab)
    ok[ok] = vocab[tid[ok]] == qt[ok]
    tid, qr = tid[ok], qr[ok]
    # expand postings
    reps = index["counts"][tid]
    eidx = index["post_rows"][_expand(index["starts"][tid], reps)]
    qrep = np.repeat(qr, reps)
    w = np.repeat(index["units"][tid], reps)
    # per (query, entity) sum — sort + reduceat (exact int64)
    o2 = np.lexsort((eidx, qrep))
    qrep, eidx, w = qrep[o2], eidx[o2], w[o2]
    new = np.ones(len(qrep), bool)
    if len(qrep) > 1:
        new[1:] = (qrep[1:] != qrep[:-1]) | (eidx[1:] != eidx[:-1])
    gstarts = np.nonzero(new)[0]
    gq, ge = qrep[gstarts], eidx[gstarts]
    gs = np.add.reduceat(w, gstarts) if len(gstarts) else \
        np.empty(0, np.int64)
    # top-k per query: sort (query, -score, entity), keep pos < k
    o3 = np.lexsort((ge, -gs, gq))
    gq, ge, gs = gq[o3], ge[o3], gs[o3]
    newq = np.ones(len(gq), bool)
    if len(gq) > 1:
        newq[1:] = gq[1:] != gq[:-1]
    qstarts = np.nonzero(newq)[0]
    seg = np.cumsum(newq) - 1
    pos = np.arange(len(gq)) - qstarts[seg]
    m = pos < k
    return gq[m], ge[m], gs[m], (pos[m] + 1).astype(np.int64)


def lexical_topk(queries: ray.data.Dataset, *, entity_ids: np.ndarray,
                 entity_texts, k: int = 5, id_col: str = "doc_id",
                 text_col: str = "text",
                 out_entity_col: str = "entity_id",
                 broadcast_token_cap: int = 50_000_000,
                 num_partitions: int = 16) -> ray.data.Dataset:
    """→ (id_col, out_entity_col, score_units: int64, rn: int64 1..k) —
    the k highest-scoring entities per query document (score DESC, ties
    by entity ASC; zero-overlap pairs absent). Plan duality documented in
    the module header; past ``broadcast_token_cap`` posting rows the
    distributed join plan runs instead (same output)."""
    index = build_lexical_index(np.asarray(entity_ids), entity_texts)
    if len(index["post_rows"]) > broadcast_token_cap:
        return _lexical_topk_join(queries, index, k=k, id_col=id_col,
                                  text_col=text_col,
                                  out_entity_col=out_entity_col,
                                  num_partitions=num_partitions)
    idx_ref = ray.put(index)
    ent_dtype = np.asarray(entity_ids).dtype

    def score(b: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        rows, toks = tokenize_column(b[text_col])
        q, e, s, rn = score_batch(ix, rows, toks, k)
        ids = ix["entity_ids"][e]
        return pa.table({
            id_col: b[id_col].take(pa.array(q, pa.int64())),
            out_entity_col: pa.array(ids),
            "score_units": pa.array(s, pa.int64()),
            "rn": pa.array(rn, pa.int64()),
        })

    return queries.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def _lexical_topk_join(queries: ray.data.Dataset, index: dict, *, k: int,
                       id_col: str, text_col: str, out_entity_col: str,
                       num_partitions: int) -> ray.data.Dataset:
    """Distributed plan: distinct query tokens ⋈ posting rows on token →
    int64 pair sums → topn_per_group. The posting table ships as a
    Dataset (token, entity, units); only matching tokens survive the
    join, and the pair groupby moves pre-combined slim rows."""
    from .rank import topn_per_group

    post = ray.data.from_arrow(pa.table({
        "token": pa.array(np.repeat(index["vocab"], index["counts"])),
        out_entity_col: pa.array(index["entity_ids"][index["post_rows"]]),
        "units": pa.array(np.repeat(index["units"], index["counts"]),
                          pa.int64()),
    })).repartition(num_partitions)

    def qtok(b: pa.Table) -> pa.Table:
        rows, toks = tokenize_column(b[text_col])
        t = pa.table({id_col: b[id_col].take(pa.array(rows, pa.int64())),
                      "token": pa.array(toks)})
        return t.group_by([id_col, "token"]).aggregate([]) \
            .rename_columns([id_col, "token"])

    qt = queries.select_columns([id_col, text_col]).map_batches(
        qtok, batch_format="pyarrow")
    joined = qt.join(post, "inner", num_partitions,
                     on=("token",), right_on=("token",))

    def pair_partial(b: pa.Table) -> pa.Table:
        g = b.group_by([id_col, out_entity_col]).aggregate([("units", "sum")])
        return g.rename_columns([id_col, out_entity_col, "score_units"])

    from ray.data.aggregate import Sum

    pairs = (joined.map_batches(pair_partial, batch_format="pyarrow")
             .groupby([id_col, out_entity_col])
             .aggregate(Sum("score_units", alias_name="score_units")))
    out = topn_per_group(pairs, key_col=id_col, order_col="score_units",
                         id_col=out_entity_col, n=k)

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col], out_entity_col: b[out_entity_col],
            "score_units": pc.cast(b["score_units"], pa.int64()),
            "rn": pc.cast(b["rn"], pa.int64()),
        })

    return out.map_batches(fin, batch_format="pyarrow")
