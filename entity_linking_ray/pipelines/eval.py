"""Evaluation: pairwise F1 at shared blocking keys, recall@k, accuracy.

Reference analogues: G2 recall@gen (``candidate_retrieval/evaluator.py:
16-91``), G3 rank histogram (``zeshel_utils.py:70-99``), G4 accuracy/P/R/F1
(``el_main.py:665-670``). The pairwise-F1-at-block-key metric is the
BASELINE.json gate: over all mention pairs that share a blocking key
(normalized surface form), gold-match = both link to the same non-NIL gold
entity; predicted-match = same predicted cluster.

Driver-side pandas implementations — these run on small labeled sets
(the gold corpus), not on the document stream.
"""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd

from ..functions.normalize import normalize_str


def pairwise_f1(clusters_df: pd.DataFrame, gold_df: pd.DataFrame) -> dict:
    """clusters_df: (doc_id, span_idx, offset, cluster_id);
    gold_df: (doc_id, span_idx, offset, mention, entity_id)."""
    g = gold_df.copy()
    g["block"] = [normalize_str(m) for m in g["mention"]]
    merged = g.merge(clusters_df, on=["doc_id", "span_idx", "offset"], how="left")
    # span_idx in the fill id: unmatched mentions sharing (doc_id, offset)
    # but differing in span_idx stay distinct singletons (same rule as
    # b_cubed's fallback below)
    merged["cluster_id"] = merged["cluster_id"].fillna(
        "u:" + merged["doc_id"] + ":" + merged["span_idx"].astype(str)
        + ":" + merged["offset"].astype(str)
    )

    tp = fp = fn = 0
    for _, grp in merged.groupby("block"):
        rows = grp.reset_index(drop=True)
        n = len(rows)
        ent = rows["entity_id"].to_numpy()
        cl = rows["cluster_id"].to_numpy()
        for i in range(n):
            for j in range(i + 1, n):
                gold_match = ent[i] == ent[j] and ent[i] != "NIL"
                pred_match = cl[i] == cl[j]
                if gold_match and pred_match:
                    tp += 1
                elif pred_match and not gold_match:
                    fp += 1
                elif gold_match and not pred_match:
                    fn += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall, "f1": f1}


def link_accuracy(links_df: pd.DataFrame, gold_df: pd.DataFrame) -> dict:
    """Per-mention link accuracy incl. NIL handling (G4 analogue)."""
    merged = gold_df.merge(
        links_df, on=["doc_id", "span_idx", "offset"], how="left", suffixes=("_gold", "_pred")
    )
    merged["entity_id_pred"] = merged["entity_id_pred"].fillna("NIL")
    correct = (merged["entity_id_gold"] == merged["entity_id_pred"]).sum()
    return {
        "n": len(merged),
        "correct": int(correct),
        "accuracy": float(correct / len(merged)) if len(merged) else 1.0,
    }


def recall_at_k(scored_pairs_df: pd.DataFrame, gold_df: pd.DataFrame,
                ks=(1, 5, 10)) -> dict:
    """Fraction of non-NIL gold mentions whose gold entity appears in the
    candidate top-k (G2/G3 analogue)."""
    gold = gold_df[gold_df["entity_id"] != "NIL"]
    cand = scored_pairs_df.merge(
        gold, on=["doc_id", "span_idx", "offset"], how="inner", suffixes=("", "_gold")
    )
    hit_rank: dict[tuple, int] = {}
    for r in cand.itertuples():
        if r.entity_id == r.entity_id_gold:
            key = (r.doc_id, r.span_idx, r.offset)
            hit_rank[key] = min(hit_rank.get(key, 1 << 30), r.rank)
    out = {}
    n = len(gold)
    for k in ks:
        out[f"recall@{k}"] = sum(1 for v in hit_rank.values() if v < k) / n if n else 1.0
    return out


def cluster_size_histogram(clusters_df: pd.DataFrame) -> dict[int, int]:
    sizes = clusters_df.groupby("cluster_id").size()
    return dict(collections.Counter(sizes.tolist()))


def rank_histogram(scored_pairs_df: pd.DataFrame, gold_df: pd.DataFrame,
                   buckets=(1, 4, 8, 10, 16, 32, 64, 100)) -> dict:
    """G3 rank histogram (reference Stats, zeshel_utils.py:70-99): counts
    of gold-entity rank < b for each bucket b, over non-NIL gold mentions."""
    gold = gold_df[gold_df["entity_id"] != "NIL"]
    cand = scored_pairs_df.merge(
        gold, on=["doc_id", "span_idx", "offset"], how="inner", suffixes=("", "_gold")
    )
    hits = cand[cand["entity_id"] == cand["entity_id_gold"]]
    best_rank = hits.groupby(["doc_id", "span_idx", "offset"])["rank"].min()
    out = {"total": int(len(gold))}
    for b in buckets:
        out[f"rank<{b}"] = int((best_rank < b).sum())
    return out


def b_cubed(clusters_df: pd.DataFrame, gold_df: pd.DataFrame) -> dict:
    """B³ precision/recall/F1 (Bagga & Baldwin 1998) — the standard ER
    cluster-quality metric beside pairwise F1: element-averaged instead
    of pair-counted, so one giant wrong merge is penalized per swallowed
    mention rather than quadratically dominating the score. Same input
    contract as :func:`pairwise_f1`; unmatched mentions count as
    singleton clusters; gold classes are entity_id with NIL mentions
    each their own singleton class (linking a NIL is a precision error,
    splitting distinct NILs is not a recall error)."""
    g = gold_df.merge(clusters_df, on=["doc_id", "span_idx", "offset"],
                      how="left")
    g = g.reset_index(drop=True)
    # span_idx included: two unmatched mentions sharing (doc_id, offset)
    # but differing in span_idx must stay distinct singletons
    g["cluster_id"] = g["cluster_id"].fillna(
        "u:" + g["doc_id"].astype(str) + ":" + g["span_idx"].astype(str)
        + ":" + g["offset"].astype(str))
    gold_cls = np.where(
        g["entity_id"].to_numpy() == "NIL",
        np.char.add("nil:", np.arange(len(g)).astype(str)),
        g["entity_id"].astype(str).to_numpy())
    pred = g["cluster_id"].astype(str).to_numpy()

    df = pd.DataFrame({"g": gold_cls, "p": pred})
    joint = df.groupby(["g", "p"]).size()          # |g ∩ p|
    gsize = df.groupby("g").size()
    psize = df.groupby("p").size()
    inter = joint.to_numpy(dtype=np.float64)
    gs = gsize.loc[joint.index.get_level_values("g")].to_numpy(np.float64)
    ps = psize.loc[joint.index.get_level_values("p")].to_numpy(np.float64)
    n = float(len(df))
    # per-element averages collapse to sum(|g∩p|² / |side|) / N
    precision = float((inter * inter / ps).sum() / n)
    recall = float((inter * inter / gs).sum() / n)
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "n_mentions": int(n)}


def adjusted_rand_index(clusters_df: pd.DataFrame,
                        gold_df: pd.DataFrame) -> dict:
    """Adjusted Rand Index (Hubert & Arabie 1985) — chance-corrected pair
    agreement, the third standard ER cluster metric beside pairwise F1
    and B³ (ARI is symmetric and rewards correct NON-links too). Same
    input/NIL/singleton conventions as :func:`b_cubed`; all pair counts
    are exact integer combinatorics (only the final ratio is float)."""
    g = gold_df.merge(clusters_df, on=["doc_id", "span_idx", "offset"],
                      how="left").reset_index(drop=True)
    g["cluster_id"] = g["cluster_id"].fillna(
        "u:" + g["doc_id"].astype(str) + ":" + g["span_idx"].astype(str)
        + ":" + g["offset"].astype(str))
    gold_cls = np.where(
        g["entity_id"].to_numpy() == "NIL",
        np.char.add("nil:", np.arange(len(g)).astype(str)),
        g["entity_id"].astype(str).to_numpy())
    pred = g["cluster_id"].astype(str).to_numpy()

    def pairs2(sizes: np.ndarray) -> int:
        s = sizes.astype(np.int64)
        return int((s * (s - 1) // 2).sum())

    df = pd.DataFrame({"g": gold_cls, "p": pred})
    sum_ij = pairs2(df.groupby(["g", "p"]).size().to_numpy())
    sum_g = pairs2(df.groupby("g").size().to_numpy())
    sum_p = pairs2(df.groupby("p").size().to_numpy())
    n_pairs = len(df) * (len(df) - 1) // 2
    if n_pairs == 0:
        return {"ari": 1.0, "n_mentions": int(len(df))}
    expected = sum_g * sum_p / n_pairs
    max_index = (sum_g + sum_p) / 2.0
    denom = max_index - expected
    ari = 1.0 if denom == 0 else float((sum_ij - expected) / denom)
    return {"ari": ari, "n_mentions": int(len(df))}
