"""Deterministic distributed sampling for training-data pipelines.

The reference's only sampling is the seeded train/test shuffle split
(SURVEY.md §2 M16/T7, re-expressed in ``pipelines/train_prep.py``); a
corpus-scale engine also needs per-stratum and weighted selection. Both
operators here are DETERMINISTIC functions of the row id — no RNG state,
so re-running any partition reproduces the same sample (the resumability
requirement), the result is independent of partitioning/arrival order,
and a SQL oracle can replay the exact selection.

- :func:`stratified_sample` — n rows per stratum, chosen by ascending
  affine hash of the id (a Lehmer/Park-Miller step, ``(id*48271 + 11)
  mod (2^31-1)``): uniform within each stratum, exactly n kept (fewer if
  the stratum is smaller). Runs as the two-level top-n combiner of
  ``stages/rank.topn_per_group`` — each batch keeps at most n rows per
  stratum it contains, so the shuffle moves partial winners only.
- :func:`weighted_sample` — global weighted sample WITHOUT replacement
  of k rows (Efraimidis–Spirakis A-ES, IPL 2006): each row draws
  u = affine_hash(id)/m ∈ (0,1) and scores key = u^(1/weight); the k
  largest keys are the sample. Inclusion probability is proportional to
  weight at each of the k draws. Per-batch partial top-k (vectorized
  argpartition) reduces every batch to ≤ k rows before the single final
  merge — a top-k tournament, not a global sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# Lehmer-style affine step: full-period multiplier 48271 mod the Mersenne
# prime 2^31-1 (Park-Miller); +11 decouples id 0 from u=0
_A = 48271
_B = 11
_M = 2147483647


def _u01(ids: np.ndarray) -> np.ndarray:
    """Deterministic uniform-ish (0,1] draw per int64 id — exact int64
    arithmetic (no overflow: |id|·48271 < 2^63 for ids below 2^47), so a
    SQL oracle reproduces it bit-for-bit."""
    r = (ids.astype(np.int64) * _A + _B) % _M
    return (r.astype(np.float64) + 1.0) / float(_M)


def stratified_sample(ds: ray.data.Dataset, *, key_col: str, id_col: str,
                      n_per_key: int,
                      keep_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """→ (key_col, id_col, *keep_cols) — exactly ``n_per_key`` rows per
    stratum (all rows when a stratum is smaller), picked by ascending
    ``(affine_hash(id), id)``. Equivalent SQL:
    ``QUALIFY row_number() OVER (PARTITION BY key ORDER BY
    (id*48271+11) % 2147483647, id) <= n``."""
    from .rank import topn_per_group

    def add_order(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        h = (ids * _A + _B) % _M
        # topn_per_group keeps the LARGEST order values — negate for
        # ascending-hash selection
        return b.append_column("__ord", pa.array(-h, pa.int64()))

    out = topn_per_group(
        ds.map_batches(add_order, batch_format="pyarrow"),
        key_col=key_col, order_col="__ord", id_col=id_col, n=n_per_key,
        keep_cols=keep_cols)
    return out.drop_columns(["__ord", "rn"])


def weighted_sample(ds: ray.data.Dataset, *, id_col: str, weight_col: str,
                    k: int,
                    keep_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """→ (id_col, weight_col, *keep_cols) — k-row weighted sample without
    replacement (A-ES keys ``u^(1/w)``, u a deterministic function of the
    id). Rows with weight <= 0 are never selected. The float key is a
    selection device only — it is NOT emitted, so the driver's value-hash
    surface stays integer-exact (a ~1-ulp libm divergence from the SQL
    oracle could only matter in the measure-zero event of a near-tie at
    the k-th boundary)."""
    cols = [id_col, weight_col, *keep_cols]

    def partial_topk(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        w = pc.cast(b[weight_col],
                    pa.float64()).to_numpy(zero_copy_only=False)
        key = np.where(w > 0, _u01(ids) ** (1.0 / np.maximum(w, 1e-300)),
                       -1.0)
        if len(ids) > k:
            sel = np.argpartition(-key, k - 1)[:k]
        else:
            sel = np.arange(len(ids))
        sel = sel[key[sel] >= 0]
        t = b.select(cols).take(pa.array(sel, pa.int64()))
        # fan-in bucket: the grouping is arbitrary — top-k of per-group
        # top-ks contains the global top-k whatever the tree shape
        return t.append_column("__key", pa.array(key[sel], pa.float64())) \
                .append_column("__g", pa.array(
                    np.arange(len(sel), dtype=np.int64) % 64))

    def level_topk(group: pd.DataFrame) -> pd.DataFrame:
        return (group.sort_values(["__key", id_col],
                                  ascending=[False, True]).head(k)
                [[*cols, "__key"]].reset_index(drop=True))

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["__key", id_col],
                              ascending=[False, True]).head(k)
        return g[cols].reset_index(drop=True)

    # TWO-LEVEL tournament: a single flat merge would feed k×num_batches
    # rows into one task — unbounded at corpus scale; level 1 reduces 64
    # fan-in groups to k rows each, the final merge sees ≤ 64k rows
    return (ds.map_batches(partial_topk, batch_format="pyarrow")
            .groupby("__g").map_groups(level_topk, batch_format="pandas")
            .map_batches(lambda b: b.append_column(
                "__g2", pa.array(np.zeros(b.num_rows, np.int64))),
                batch_format="pyarrow")
            .groupby("__g2").map_groups(final, batch_format="pandas"))


def rate_thin(ds: ray.data.Dataset, *, id_col: str,
              keep_num: int, keep_den: int,
              salt: int = 0) -> ray.data.Dataset:
    """Deterministic rate thinning: keep a row iff
    ``((id*48271 + 11 + salt) % (2^31-1)) % keep_den < keep_num`` —
    i.e. keep_num/keep_den of the rows, chosen by the same RNG-free
    affine draw as the samplers above (partition-independent, resumable,
    SQL-replayable). ``salt`` decorrelates independent thinning passes
    over the same ids."""
    if not (0 < keep_num <= keep_den):
        raise ValueError("need 0 < keep_num <= keep_den")

    def flt(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        r = (ids * _A + _B + salt) % _M
        return b.filter(pa.array((r % keep_den) < keep_num))

    return ds.map_batches(flt, batch_format="pyarrow")


def mix_corpora(sources: "list[tuple[ray.data.Dataset, int, int]]", *,
                id_col: str) -> ray.data.Dataset:
    """Training-data source mixing: union the sources, each thinned to
    its (keep_num, keep_den) rate — the "re-weight corpus A to 25%, keep
    corpus B whole" pre-training mix, as a pure streaming filter + union
    (no shuffle, no RNG state; every partition of every source thins
    independently and reproducibly). Schemas must align (Dataset.union
    semantics); per-source salt = source index, so the same id in two
    sources draws independently."""
    if not sources:
        raise ValueError("mix_corpora needs at least one source")
    thinned = [ds if (num, den) == (1, 1)
               else rate_thin(ds, id_col=id_col, keep_num=num,
                              keep_den=den, salt=i)
               for i, (ds, num, den) in enumerate(sources)]
    out = thinned[0]
    for t in thinned[1:]:
        out = out.union(t)
    return out
