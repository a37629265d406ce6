"""Bucketed groupby-aggregate: the repo's standard high-cardinality
aggregation shape, factored out.

Ray 2.49's native ``groupby(key).aggregate(...)`` is sort-based with
per-key overhead — measured ~5 s for a plain Sum over 20k keys at
sf0.1 and ~80x slower than Arrow's hash aggregation at 10M rows
(stages/clustering.py lesson). Every hot aggregation here therefore
runs as:

    per-batch Arrow combiner (one row per distinct key per block)
    → coarse splitmix/FNV bucket column (``num_buckets`` values)
    → groupby(bucket).map_groups with ONE vectorized Arrow group_by
      per bucket.

The shuffle moves pre-combined slim rows on a ~64-value key; the real
aggregation is C-speed hash grouping. Associative/commutative merge
functions only (sum/min/max/count), so partial-then-merge is exact.

This module generalizes the hand-rolled instances (clustering
``_groupby_min``, dedup ``duplicated_lines``, graph degree sums) into
one helper; new call sites should use it instead of re-deriving the
pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import hash_strings_arrow, splitmix64

# merge function applied per bucket for each partial kind
_MERGE_FN = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def _bucket_col(tbl: pa.Table, key: str, num_buckets: int) -> pa.Array:
    # Null keys are legal (Arrow group_by groups them); the bucket is
    # only a co-location hint, so collapsing nulls onto a sentinel
    # bucket is harmless — fill BEFORE hashing (the string hasher
    # rejects nulls, and fill_null keeps the int path int64 so large
    # ids never round-trip through float64).
    import pyarrow.compute as pc

    col = tbl[key]
    if pa.types.is_null(col.type):
        # an all-null column arrives TYPED null (e.g. Arrow inference
        # over [None, ...]); fill_null can't cast into it — every key is
        # the null group, so the whole column is one sentinel bucket
        return pa.array(np.zeros(len(col), np.int64), pa.int64())
    if pa.types.is_integer(col.type):
        if col.null_count:
            col = pc.fill_null(col, 0)
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(v) % np.uint64(num_buckets)).astype(np.int64)
    else:
        if col.null_count:
            col = pc.fill_null(col, "")
        b = hash_strings_arrow(col) % num_buckets
    return pa.array(b, pa.int64())


def bucketed_agg(ds: ray.data.Dataset, keys: "list[str] | str",
                 aggs: "list[tuple[str, str, str]]" = (), *,
                 num_buckets: int = 64) -> ray.data.Dataset:
    """→ one row per distinct ``keys`` tuple with the requested
    aggregates; ``aggs`` entries are ``(col, fn, out_name)`` with fn in
    {"sum", "min", "max", "count"} ("count" counts NON-NULL values of
    the named column — same as the native groupby Count it replaces, so
    an all-null group reports 0). Empty ``aggs`` → distinct keys.
    Buckets hash on ``keys[0]`` (int64 splitmix / string FNV) — the
    usual skew caveat: a single hot first-key value serializes into one
    bucket, so pick the high-cardinality key first."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    aggs = list(aggs)
    for _, fn, _ in aggs:
        if fn not in _MERGE_FN:
            raise ValueError(f"unsupported aggregate fn {fn!r}")
    out_names = keys + [out for _, _, out in aggs]
    part_cols = [f"__a{i}" for i in range(len(aggs))]

    def partial(b: pa.Table) -> pa.Table:
        spec = [(c, fn) for c, fn, _ in aggs]
        g = b.group_by(keys).aggregate(spec)
        g = g.rename_columns(keys + part_cols)
        return g.append_column("__ab", _bucket_col(g, keys[0],
                                                   num_buckets))

    def merge(g: pa.Table) -> pa.Table:
        spec = [(pc_, _MERGE_FN[fn])
                for pc_, (_, fn, _) in zip(part_cols, aggs)]
        return (g.group_by(keys).aggregate(spec)
                .rename_columns(out_names))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__ab").map_groups(merge, batch_format="pyarrow"))
