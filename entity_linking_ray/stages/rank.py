"""Rank-family operators: exact distributed quantiles and grouped top-N.

Both are built on the combiner-before-shuffle shape (SURVEY.md §2.6's
pre-aggregate guidance): a ``map_batches`` stage collapses each input
block to a bounded partial (a value histogram / a per-key top-N), so the
all-to-all groupby moves partials, never raw rows.

``grouped_quantiles``: exact discrete quantiles (DuckDB ``quantile_disc``
semantics — the value at 1-based rank ``ceil(q*n)``) over a fixed-point
quantization of a float column. Floats are quantized to int64 units
(default cents, round-half-away-from-zero — the SQL ``round()`` rule) so
the reduction is exact integer counting: per-block Arrow ``group_by``
histograms → one groupby(key) over (key, unit, count) partials → a
vectorized cumsum picks each rank. Shuffle volume per key is bounded by
distinct quantized values × blocks, independent of row count — the shape
that survives 100 TB where a sort-based quantile would be a global sort.

``topn_per_group``: deterministic top-N rows per key (order column desc,
tie-broken by an id column asc). The per-block combiner keeps at most N
rows per key per block, so the shuffle carries ≤ N × blocks rows per key.
Equivalent SQL: ``row_number() OVER (PARTITION BY key ORDER BY val DESC,
id ASC) <= n``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _unit_hist(key_col: str, val_col: str, scale: int):
    """Per-batch (key, round(val·scale) unit, count) combiner — the
    shared first stage of both quantile operators (the round_mode must
    match DuckDB ``round()`` exactly; change it in ONE place only)."""
    def hist(batch: pa.Table) -> pa.Table:
        units = pc.cast(pc.round(
            pc.multiply(pc.cast(batch[val_col], pa.float64()),
                        pa.scalar(float(scale))),
            round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({key_col: batch[key_col], "__u": units})
        g = t.group_by([key_col, "__u"]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "__u", "__c"])

    return hist


def _merged_hist(group: pd.DataFrame):
    """(sorted distinct units, cumulative counts, n) of one key's
    partial histogram rows — merges duplicate units coming from
    different blocks' partials; shared by both quantile finalizers."""
    u = group["__u"].to_numpy(np.int64)
    c = group["__c"].to_numpy(np.int64)
    uu, inv = np.unique(u, return_inverse=True)
    cc = np.zeros(len(uu), np.int64)
    np.add.at(cc, inv, c)
    cum = np.cumsum(cc)
    return uu, cum, int(cum[-1])


def grouped_quantiles(ds: ray.data.Dataset, *, key_col: str, val_col: str,
                      qs_pct: tuple[int, ...] = (50, 95, 99),
                      scale: int = 100) -> ray.data.Dataset:
    """→ (key_col, n: int64, p{q}_units: int64 per q in qs_pct).

    Exact ``quantile_disc`` over ``round(val*scale)`` int64 units. Ranks
    use pure integer math (``(p*n + 99) // 100``) — no float rank
    drift against the SQL oracle."""
    qs = tuple(int(q) for q in qs_pct)

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        uu, cum, n = _merged_hist(group)
        out = {key_col: [group[key_col].iloc[0]], "n": [n]}
        for p in qs:
            r = max(1, (p * n + 99) // 100)  # ceil(p/100 * n), integer-exact
            out[f"p{p}_units"] = [int(uu[np.searchsorted(cum, r)])]
        return pd.DataFrame(out)

    return (ds.map_batches(_unit_hist(key_col, val_col, scale),
                           batch_format="pyarrow")
            .groupby(key_col)
            .map_groups(finalize, batch_format="pandas"))


def grouped_quantiles_cont(ds: ray.data.Dataset, *, key_col: str,
                           val_col: str,
                           qs_pct: tuple[int, ...] = (25, 50, 75),
                           scale: int = 100) -> ray.data.Dataset:
    """→ (key_col, n: int64, p{q}_cont: float64 per q) — SQL
    ``quantile_cont`` (linear interpolation at rank q·(n−1) over the
    sorted multiset), same count-histogram plan as
    :func:`grouped_quantiles` (per-batch (key, unit) count combiner, one
    key shuffle of histogram rows — values never move).

    ``qs_pct`` is restricted to {25, 50, 75}: quarter fractions and
    integer units make EVERY intermediate exactly representable in
    float64, so the result is the exact rational regardless of which
    algebraic variant of the interpolation formula the oracle engine
    uses — the float output stays value-hash-stable. Other percentiles
    would ride DuckDB's exact float rounding behavior and are refused
    loudly rather than silently hash-flaky."""
    qs = tuple(int(q) for q in qs_pct)
    bad = [q for q in qs if q not in (25, 50, 75)]
    if bad:
        raise ValueError(
            f"grouped_quantiles_cont: percentiles {bad} are not exactly "
            "float64-representable quarter fractions; only 25/50/75 keep "
            "the interpolated result bit-stable across engines")

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        uu, cum, n = _merged_hist(group)
        out = {key_col: [group[key_col].iloc[0]], "n": [n]}
        for p in qs:
            r = (p / 100.0) * (n - 1)  # exact: p/100 ∈ {.25,.5,.75}
            k = int(np.floor(r))
            frac = r - k
            lo = float(uu[np.searchsorted(cum, k + 1)])
            hi = float(uu[np.searchsorted(cum, min(k + 2, n))])
            out[f"p{p}_cont"] = [lo + (hi - lo) * frac]
        return pd.DataFrame(out)

    return (ds.map_batches(_unit_hist(key_col, val_col, scale),
                           batch_format="pyarrow")
            .groupby(key_col)
            .map_groups(finalize, batch_format="pandas"))


def block_topn(df: pd.DataFrame, key_col: str, order_col: str,
               id_col: str, n: int) -> pd.DataFrame:
    """Top-``n`` rows per key within one block (order desc, id asc) —
    the combiner AND the finalizer kernel; emits ≤ n rows per key."""
    df = df.sort_values([order_col, id_col], ascending=[False, True],
                        kind="mergesort")
    return df.groupby(key_col, sort=False).head(n)


def _code(arr: np.ndarray) -> np.ndarray:
    """Sortable int codes preserving value order (np.unique) for object
    dtypes; numeric arrays pass through."""
    if arr.dtype.kind in "OUS":
        _, inv = np.unique(arr, return_inverse=True)
        return inv
    return arr


def _topn_select(tbl: pa.Table, key_col: str, order_col: str,
                 id_col: str, n: int) -> tuple[np.ndarray, np.ndarray]:
    """→ (row indices of the per-key top-n, 1-based in-key rank) over an
    Arrow table — sort by (key, order desc, id asc) via factorized
    lexsort, keep positions < n. The Arrow-native twin of block_topn
    (identical selection and rank; row order differs, which the
    order-insensitive consumers never observe)."""
    keys = _code(tbl[key_col].to_numpy(zero_copy_only=False))
    ids = _code(tbl[id_col].to_numpy(zero_copy_only=False))
    vals = tbl[order_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -vals, keys))
    ks = keys[order]
    m = len(ks)
    if m == 0:
        z = np.empty(0, np.int64)
        return z, z
    new = np.ones(m, bool)
    new[1:] = ks[1:] != ks[:-1]
    starts = np.nonzero(new)[0]
    seg = np.cumsum(new) - 1
    pos = np.arange(m) - starts[seg]
    keep = pos < n
    return order[keep], (pos[keep] + 1).astype(np.int64)


def topn_per_group(ds: ray.data.Dataset, *, key_col: str, order_col: str,
                   id_col: str, n: int,
                   keep_cols: tuple[str, ...] = (),
                   num_buckets: int = 64) -> ray.data.Dataset:
    """→ (key_col, rn: int64 1..n, id_col, order_col, *keep_cols) — the
    top ``n`` rows per key ordered by ``order_col`` DESC with ties broken
    by ``id_col`` ASC (row_number semantics, fully deterministic).

    The shuffle groups by a coarse KEY-HASH bucket, not the key: each
    finalize call handles many keys with one vectorized lexsort +
    segment head — one call per raw key collapses when there are
    millions of small groups (measured on the TF-IDF top-k). Both
    kernels are Arrow-native (factorized lexsort + take), no per-group
    pandas frames."""
    cols = [key_col, id_col, order_col, *keep_cols]

    def combiner(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        sel, _ = _topn_select(batch, key_col, order_col, id_col, n)
        part = batch.take(pa.array(sel, pa.int64()))
        kb = pd.util.hash_array(
            part[key_col].to_numpy(zero_copy_only=False)) % num_buckets
        return part.append_column("__kb", pa.array(kb.astype(np.int64),
                                                   pa.int64()))

    def finalize(group: pa.Table) -> pa.Table:
        group = group.select(cols)
        sel, rn = _topn_select(group, key_col, order_col, id_col, n)
        take = pa.array(sel, pa.int64())
        data = {key_col: group[key_col].take(take),
                "rn": pa.array(rn, pa.int64()),
                id_col: group[id_col].take(take),
                order_col: group[order_col].take(take)}
        for c in keep_cols:
            data[c] = group[c].take(take)
        return pa.table(data)

    return (ds.map_batches(combiner, batch_format="pyarrow")
            .groupby("__kb")
            .map_groups(finalize, batch_format="pyarrow"))


def skyline_2d(ds: "ray.data.Dataset", *, id_col: str, x_col: str,
               y_col: str) -> "ray.data.Dataset":
    """→ the 2-D Pareto frontier MINIMIZING both columns: rows no other
    row weakly dominates with at least one strict improvement (identical
    points all survive — they do not strictly dominate each other). SQL
    shape: ``NOT EXISTS (b.x <= a.x AND b.y <= a.y AND (b.x < a.x OR
    b.y < a.y))``.

    The textbook distributive op: dominance is transitive, so the global
    skyline is a subset of every local skyline — each block emits its
    OWN frontier (the combiner; a sort + segmented exclusive cummin, no
    pairwise scan), and one final merge re-applies the same kernel over
    the surviving points. A random-order 2-D skyline is O(log n) points,
    so the merge group is tiny; a pathological anti-correlated input can
    make the frontier large — the merge assumes it fits one task (the
    same documented cap as grouped_ordered_concat)."""
    def sky(df: pd.DataFrame) -> pd.DataFrame:
        if "__g" in df.columns:
            df = df.drop(columns="__g")
        g = df.sort_values([x_col, y_col, id_col],
                           kind="mergesort").reset_index(drop=True)
        x = g[x_col].to_numpy(np.int64)
        y = g[y_col].to_numpy(np.int64)
        n = len(g)
        if n == 0:
            return g
        new = np.ones(n, dtype=bool)
        new[1:] = x[1:] != x[:-1]
        starts = np.nonzero(new)[0]
        seg = np.cumsum(new) - 1
        gmin = y[starts]                      # min y per x group (sorted)
        best_prev = np.empty(len(starts), np.int64)
        best_prev[0] = np.iinfo(np.int64).max  # exclusive running min
        if len(starts) > 1:
            best_prev[1:] = np.minimum.accumulate(gmin)[:-1]
        keep = (y == gmin[seg]) & (gmin[seg] < best_prev[seg])
        return g[keep]

    def local(b: pa.Table) -> pa.Table:
        out = sky(b.select([id_col, x_col, y_col]).to_pandas())
        out["__g"] = np.zeros(len(out), np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby("__g").map_groups(sky, batch_format="pandas"))
