"""Distributed prefix-scan (running sum) and token-bin packing.

A prefix sum over a global ordering is the classic distributed SCAN: it
cannot ride a plain groupby (every row's value depends on all preceding
rows). The scale shape used here is range-bucketed two-phase scan:

1. bucket each row by a range partition of the order column (equi-depth
   boundaries from per-block quantile sketches — NOT a sort);
2. per-bucket: order rows, cumsum locally, and emit the bucket TOTAL;
3. the bucket totals (one row per bucket, driver-small by construction)
   cumsum on the driver into per-bucket offsets, broadcast back;
4. per-bucket local cumsum + its bucket's offset = the global scan.

Only the per-bucket totals ever leave the workers, so the driver-side
state is O(num_buckets) regardless of row count. Equivalent SQL:
``sum(v) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)``.

``pack_by_token_budget`` builds greedy contiguous sequence packing on
top of it (the training-data "pack documents into fixed-token bins"
op): bin_id = exclusive_prefix // capacity in the order-column order —
deterministic, so an SQL window oracle can verify it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


_SKETCH_POINTS = 33  # per-block quantile points shipped to the driver


def _bucket_boundaries(ds: ray.data.Dataset, order_col: str,
                       num_buckets: int) -> np.ndarray:
    """Equi-depth range-bucket boundaries over ``order_col``: each block
    emits a tiny quantile sketch (``_SKETCH_POINTS`` value points + its
    row count), the driver merges them by weighted rank — O(blocks × 33)
    driver rows, no sort, no RNG (deterministic for resume/scaling runs).

    Returns a sorted int64 boundary array ``b``; a row's bucket is
    ``searchsorted(b, v, side="right")``. Equal values always land in
    the same bucket, so buckets remain value RANGES (cross-bucket
    ordering — what the two-phase scan/rank needs — is exact regardless
    of sketch error; sketch error only costs balance, and boundaries
    track the data distribution instead of uniform min/max width, so a
    skewed column can no longer pile most rows into one bucket).
    Empty input → empty boundaries (single bucket 0); callers
    short-circuit the empty case themselves, this is belt-and-braces."""
    qs = np.linspace(0.0, 1.0, _SKETCH_POINTS)

    def sketch(b: pa.Table) -> pa.Table:
        v = b[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.float64())})
        pts = np.quantile(v, qs, method="nearest").astype(np.int64)
        w = np.full(len(pts), len(v) / len(pts), np.float64)
        return pa.table({"v": pts, "w": w})

    samp = ds.map_batches(sketch, batch_format="pyarrow").to_pandas()
    if len(samp) == 0:
        return np.array([], np.int64)
    v = samp["v"].to_numpy(np.int64)
    w = samp["w"].to_numpy(np.float64)
    order = np.argsort(v, kind="mergesort")
    v, w = v[order], w[order]
    cw = np.cumsum(w)
    targets = cw[-1] * np.arange(1, num_buckets) / num_buckets
    bounds = v[np.minimum(np.searchsorted(cw, targets), len(v) - 1)]
    return np.unique(bounds)  # low-cardinality columns yield fewer buckets


def _typed_empty_like(ds: ray.data.Dataset,
                      extra: "dict[str, pa.DataType]") -> ray.data.Dataset:
    """Empty dataset with ``ds``'s schema plus typed extra columns —
    the pinned empty-input behavior of the scan family (matches the
    window operators': typed empty out for empty in, never a crash)."""
    sch = ds.schema()
    cols = {n: pa.array([], t) for n, t in zip(sch.names, sch.types)}
    for n, t in extra.items():
        cols[n] = pa.array([], t)
    return ray.data.from_arrow(pa.table(cols))


def prefix_sum(ds: ray.data.Dataset, *, order_col: str, val_col: str,
               out_col: str = "running", num_buckets: int = 64,
               extra_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """→ input rows + ``out_col`` = inclusive running sum of ``val_col``
    in ``order_col`` order (order values must be unique int64)."""
    cols = [order_col, val_col, *extra_cols]
    # materialize the SLIM projection once: three consumers follow (the
    # min/max bounds aggregate, the totals pass, the scan) and Ray
    # replays lineage per consumer — without this the upstream derivation
    # (e.g. the tokenize behind n_tokens) runs three times
    ds = ds.select_columns(cols).materialize()
    if ds.count() == 0:  # typed empty out for empty in (pinned behavior)
        return _typed_empty_like(ds, {out_col: pa.int64()})
    bounds = _bucket_boundaries(ds, order_col, num_buckets)

    def tag(b: pa.Table) -> pa.Table:
        v = b[order_col].to_numpy(zero_copy_only=False)
        bucket = pa.array(np.searchsorted(bounds, v, side="right")
                          .astype(np.int64))
        return b.select(cols).append_column("__b", bucket)

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    # phase 1: per-bucket totals (combiner: one row per bucket per block)
    def part_totals(b: pa.Table) -> pa.Table:
        g = b.group_by(["__b"]).aggregate([(val_col, "sum")])
        return g.rename_columns(["__b", "__t"])

    from ray.data.aggregate import Sum

    totals = (tagged.map_batches(part_totals, batch_format="pyarrow")
              .groupby("__b").aggregate(Sum("__t", alias_name="__t"))
              .to_pandas())  # O(num_buckets) rows — driver-small
    totals = totals.sort_values("__b")
    offs = dict(zip(totals["__b"].astype(np.int64),
                    np.concatenate([[0], np.cumsum(
                        totals["__t"].to_numpy(np.int64))[:-1]])))

    # phase 2: in-bucket ordered cumsum + broadcast bucket offset
    # (Arrow-native: argsort + take, no pandas frame)
    def scan(group: pa.Table) -> pa.Table:
        o = np.argsort(group[order_col].to_numpy(zero_copy_only=False),
                       kind="stable")
        base = offs[int(group["__b"][0].as_py())]
        run = base + np.cumsum(group[val_col].to_numpy(
            zero_copy_only=False).astype(np.int64)[o])
        idx = pa.array(o, pa.int64())
        out = {c: group[c].take(idx) for c in cols}
        out[out_col] = pa.array(run)
        return pa.table(out)

    return tagged.groupby("__b").map_groups(scan, batch_format="pyarrow")


def pack_by_token_budget(ds: ray.data.Dataset, *, order_col: str,
                         tokens_col: str, capacity: int,
                         num_buckets: int = 64) -> ray.data.Dataset:
    """→ (order_col, tokens_col, cum_tokens: int64, bin_id: int64) —
    contiguous greedy packing: walking rows in ``order_col`` order,
    bin_id = exclusive-prefix-sum // capacity. A document larger than
    ``capacity`` still lands in exactly one bin (its exclusive prefix
    decides), matching the SQL window formulation."""
    ds = ds.select_columns([order_col, tokens_col]).materialize()
    if ds.count() == 0:  # typed empty out for empty in (pinned behavior)
        sch = ds.schema()
        otype = dict(zip(sch.names, sch.types))[order_col]
        return ray.data.from_arrow(pa.table({
            order_col: pa.array([], otype),
            tokens_col: pa.array([], pa.int64()),
            "cum_tokens": pa.array([], pa.int64()),
            "bin_id": pa.array([], pa.int64()),
        }))
    scanned = prefix_sum(ds, order_col=order_col, val_col=tokens_col,
                         out_col="cum_tokens", num_buckets=num_buckets)

    def bins(b: pa.Table) -> pa.Table:
        excl = pc.subtract(b["cum_tokens"], pc.cast(b[tokens_col], pa.int64()))
        bin_id = pc.cast(pc.divide(excl, pa.scalar(capacity)), pa.int64())
        return pa.table({
            order_col: b[order_col],
            tokens_col: pc.cast(b[tokens_col], pa.int64()),
            "cum_tokens": pc.cast(b["cum_tokens"], pa.int64()),
            "bin_id": bin_id,
        })

    return scanned.map_batches(bins, batch_format="pyarrow")


def global_rank(ds: ray.data.Dataset, *, val_col: str, id_col: str,
                out_col: str = "rnk",
                num_buckets: int = 64) -> ray.data.Dataset:
    """→ (id_col, val_col, out_col) — the dense global ordering rank:
    SQL ``row_number() OVER (ORDER BY val, id)`` (int64 ``val_col``;
    callers fixed-point-encode floats so both sides compare identical
    integers). The classic range-partitioned sort shape: equi-depth value
    buckets from per-block quantile sketches, per-bucket counts →
    exclusive offsets (O(num_buckets) driver rows), then one
    groupby(bucket) whose kernel sorts locally and adds the offset — a
    full sort's ordering without ray.data.sort's merge step; boundaries
    follow the data distribution, so a skewed value column cannot pile
    most rows into one bucket (only an equal-value run is indivisible)."""
    cols = [id_col, val_col]
    ds = ds.select_columns(cols).materialize()  # three consumers below
    if ds.count() == 0:  # typed empty out for empty in (pinned behavior)
        return _typed_empty_like(ds, {out_col: pa.int64()})
    bounds = _bucket_boundaries(ds, val_col, num_buckets)

    def tag(b: pa.Table) -> pa.Table:
        v = b[val_col].to_numpy(zero_copy_only=False)
        bucket = pa.array(np.searchsorted(bounds, v, side="right")
                          .astype(np.int64))
        return b.append_column("__b", bucket)

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def part_counts(b: pa.Table) -> pa.Table:
        g = b.group_by(["__b"]).aggregate([([], "count_all")])
        return g.rename_columns(["__b", "__c"])

    from ray.data.aggregate import Sum

    counts = (tagged.map_batches(part_counts, batch_format="pyarrow")
              .groupby("__b").aggregate(Sum("__c", alias_name="__c"))
              .to_pandas()).sort_values("__b")
    offs = dict(zip(counts["__b"].astype(np.int64),
                    np.concatenate([[0], np.cumsum(
                        counts["__c"].to_numpy(np.int64))[:-1]])))

    def rank(group: pa.Table) -> pa.Table:
        o = np.lexsort((group[id_col].to_numpy(zero_copy_only=False),
                        group[val_col].to_numpy(zero_copy_only=False)))
        base = offs[int(group["__b"][0].as_py())]
        idx = pa.array(o, pa.int64())
        return pa.table({
            id_col: group[id_col].take(idx),
            val_col: group[val_col].take(idx),
            out_col: pa.array(base + np.arange(1, len(o) + 1,
                                               dtype=np.int64)),
        })

    return tagged.groupby("__b").map_groups(rank, batch_format="pyarrow")


def global_ntile(ds: ray.data.Dataset, *, val_col: str, id_col: str,
                 k: int, out_col: str = "tile",
                 num_buckets: int = 64) -> ray.data.Dataset:
    """→ (id_col, val_col, out_col) — SQL ``NTILE(k) OVER (ORDER BY val,
    id)``: rows split into k buckets as equal as possible, the first
    ``total % k`` buckets one row larger (the SQL remainder rule).

    Same range-partitioned shape as :func:`global_rank` (equi-depth value
    buckets from per-block quantile sketches, per-bucket counts →
    exclusive offsets, per-bucket local sort + offset); the tile is a pure function
    of the global rank and the total, both known once the O(num_buckets)
    offsets table is on the driver — no extra pass."""
    cols = [id_col, val_col]
    ds = ds.select_columns(cols).materialize()
    if ds.count() == 0:  # typed empty out for empty in (pinned behavior)
        return _typed_empty_like(ds, {out_col: pa.int64()})
    bounds = _bucket_boundaries(ds, val_col, num_buckets)

    def tag(b: pa.Table) -> pa.Table:
        v = b[val_col].to_numpy(zero_copy_only=False)
        bucket = pa.array(np.searchsorted(bounds, v, side="right")
                          .astype(np.int64))
        return b.append_column("__b", bucket)

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def part_counts(b: pa.Table) -> pa.Table:
        g = b.group_by(["__b"]).aggregate([([], "count_all")])
        return g.rename_columns(["__b", "__c"])

    from ray.data.aggregate import Sum

    counts = (tagged.map_batches(part_counts, batch_format="pyarrow")
              .groupby("__b").aggregate(Sum("__c", alias_name="__c"))
              .to_pandas()).sort_values("__b")
    cvals = counts["__c"].to_numpy(np.int64)
    offs = dict(zip(counts["__b"].astype(np.int64),
                    np.concatenate([[0], np.cumsum(cvals)[:-1]])))
    total = int(cvals.sum())
    q, r = divmod(total, k)
    boundary = r * (q + 1)  # rows before it land in the larger buckets

    def tile_of(rank0: np.ndarray) -> np.ndarray:
        big = rank0 < boundary
        t = np.empty(len(rank0), np.int64)
        t[big] = rank0[big] // (q + 1) + 1
        if q:  # q == 0 only when k >= total: every row is in a big bucket
            t[~big] = r + (rank0[~big] - boundary) // q + 1
        return t

    def rank(group: pa.Table) -> pa.Table:
        o = np.lexsort((group[id_col].to_numpy(zero_copy_only=False),
                        group[val_col].to_numpy(zero_copy_only=False)))
        base = offs[int(group["__b"][0].as_py())]
        idx = pa.array(o, pa.int64())
        return pa.table({
            id_col: group[id_col].take(idx),
            val_col: group[val_col].take(idx),
            out_col: pa.array(tile_of(
                base + np.arange(len(o), dtype=np.int64))),
        })

    return tagged.groupby("__b").map_groups(rank, batch_format="pyarrow")
