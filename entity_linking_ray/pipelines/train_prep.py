"""Training-data preparation operators (reference el_preprocess analogues).

- :func:`train_test_split` — seeded shuffle + proportional split
  (``el_preprocess.py:302-314`` 70/30 split, M16/T7).
- :func:`sample_hard_negatives` — per-mention positive + up to
  ``n_negatives`` same-alias hard negatives, gold and 'NIL' excluded
  (``el_preprocess.py:90-122``, T6/D3). Same-alias negatives are exactly
  the shared-blocking-key confusables that make the pairwise scorer
  learnable.

Both are deterministic given ``seed`` (resume/repro requirement).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import hash_strings, splitmix64


def train_test_split(ds: ray.data.Dataset, test_fraction: float = 0.3,
                     seed: int = 42) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    shuffled = ds.random_shuffle(seed=seed)
    train, test = shuffled.split_proportionately([1.0 - test_fraction])
    return train, test


def hash_split(ds: ray.data.Dataset, key_col: str,
               test_pct: int = 30, buckets: int = 100,
               out_col: str = "split") -> ray.data.Dataset:
    """Deterministic key-hash train/test assignment — the SCALE variant of
    :func:`train_test_split`: no shuffle, no materialization, stable under
    resume and under re-partitioning (assignment is a pure row function of
    the key), and incremental batches land in the same split as a full
    run. ``fnv1a(key) mod buckets < test_pct`` → 'test' else 'train'
    (the industry-standard hash-bucket holdout). Key-hash splits also
    guarantee leakage-freedom BY KEY: all rows of one key land on one
    side — the property shuffle splits cannot give."""
    def assign(batch: pa.Table) -> pa.Table:
        h = hash_strings([str(v) for v in batch[key_col].to_pylist()])
        is_test = (h % buckets) < test_pct
        lab = np.where(is_test, "test", "train")
        return batch.append_column(out_col, pa.array(lab, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def mixture_sample_tokens(ds: ray.data.Dataset, budgets: dict[str, int], *,
                          group_col: str = "source", text_col: str = "text",
                          id_col: str = "doc_id",
                          scale: int = 1_000_000) -> ray.data.Dataset:
    """Token-budget mixture sampling — the data-mixing step of a training
    pipeline: down-sample each group (source/domain/language) toward its
    token budget with a deterministic key-hash Bernoulli, so the output
    corpus approximates the requested mixture without a shuffle.

    Two passes:

    1. per-group token totals — an in-batch combiner collapses each block
       to ≤|groups| partial rows before the groupby, and only the final
       O(|groups|) totals reach the driver (bounded by the mixture spec,
       not the corpus);
    2. integer keep-thresholds ``thresh_g = min(scale, budget_g * scale
       // total_g)`` ride the task closure; a row survives iff
       ``fnv63(id) % scale < thresh_g``.

    All arithmetic is integer, so the DuckDB oracle replicates the exact
    keep-set; sampling is a pure row function of the key — resume-stable,
    partition-invariant, and incremental batches agree with a full run
    (same properties as :func:`hash_split`). Groups without a budget
    entry are kept whole. Output adds ``n_tokens`` (the whitespace token
    count the budgeting used)."""
    import pyarrow.compute as pc

    def tok_partial(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.list_value_length(
            pc.split_pattern(b[text_col], " ")), pa.int64())
        return (pa.table({group_col: b[group_col], "__t": n})
                .group_by(group_col).aggregate([("__t", "sum")])
                .rename_columns([group_col, "__t"]))

    totals = {}  # O(|groups|) driver state — bounded by the mixture spec
    for b in (ds.map_batches(tok_partial, batch_format="pyarrow")
              .groupby(group_col).sum("__t").iter_batches(batch_format="pyarrow")):
        for g, t in zip(b[group_col].to_pylist(), b["sum(__t)"].to_pylist()):
            totals[g] = int(t)
    thresh = {g: (min(scale, budgets[g] * scale // t) if g in budgets else scale)
              for g, t in totals.items()}

    def keep(b: pa.Table) -> pa.Table:
        h = np.asarray(hash_strings([str(v) for v in b[id_col].to_pylist()]))
        th = np.asarray([thresh.get(g, scale)
                         for g in b[group_col].to_pylist()], np.int64)
        n = pc.cast(pc.list_value_length(
            pc.split_pattern(b[text_col], " ")), pa.int64())
        return (b.append_column("n_tokens", n)
                .filter(pa.array(h % scale < th)))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_hard_negatives(mentions_gold: ray.data.Dataset, alias_to_ids: dict,
                          n_negatives: int = 2, seed: int = 42) -> ray.data.Dataset:
    """mentions_gold(doc_id, span_idx, mention, entity_id, offset) →
    pair rows (doc_id, span_idx, offset, mention, entity_id, label) with
    one positive (label=1) and ≤n same-alias negatives (label=0) per
    non-NIL mention. Alias dict is broadcast once."""
    from ..functions.normalize import normalize_str

    alias_ref = ray.put(alias_to_ids)

    def build(batch: pa.Table) -> pa.Table:
        a2i = ray.get(alias_ref)
        out = {"doc_id": [], "span_idx": [], "offset": [], "mention": [],
               "entity_id": [], "label": []}
        rows_h = hash_strings(
            [f"{d}|{o}" for d, o in zip(batch["doc_id"].to_pylist(),
                                        batch["offset"].to_pylist())],
            seed=seed,
        )
        for i, (d, si, off, m, gold) in enumerate(zip(
            batch["doc_id"].to_pylist(), batch["span_idx"].to_pylist(),
            batch["offset"].to_pylist(), batch["mention"].to_pylist(),
            batch["entity_id"].to_pylist(),
        )):
            if gold == "NIL":
                continue
            out["doc_id"].append(d); out["span_idx"].append(si)
            out["offset"].append(off); out["mention"].append(m)
            out["entity_id"].append(gold); out["label"].append(1)
            # same-alias negatives, gold + NIL excluded (D3), deterministic
            # rotation from the row hash (T6's random.sample made seeded)
            cands = [e for e in a2i.get(normalize_str(m), []) if e != gold]
            if cands:
                start = int(rows_h[i]) % len(cands)
                for t in range(min(n_negatives, len(cands))):
                    neg = cands[(start + t) % len(cands)]
                    out["doc_id"].append(d); out["span_idx"].append(si)
                    out["offset"].append(off); out["mention"].append(m)
                    out["entity_id"].append(neg); out["label"].append(0)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "span_idx": pa.array(out["span_idx"], pa.int32()),
            "offset": pa.array(out["offset"], pa.int32()),
            "mention": pa.array(out["mention"], pa.string()),
            "entity_id": pa.array(out["entity_id"], pa.string()),
            "label": pa.array(out["label"], pa.int8()),
        })

    return mentions_gold.map_batches(build, batch_format="pyarrow")
