"""Iterative PageRank as Ray Data shuffles (entity-popularity prior).

The reference boosts candidate entities by incoming-link count
(entity_sort/data_process.py's link-count table feeding the log-boost);
PageRank is the standard generalization of that popularity prior — and
the canonical ITERATIVE distributed algorithm: rank flows along edges
until (here) a fixed iteration budget.

Everything runs in EXACT int64 fixed-point arithmetic (rank mass in
``units`` = 1e15 parts, per-edge contribution ``(85 · r) // (100 · d)``,
teleport base ``(15 · units) // (100 · n)``) so the result is
bit-reproducible across partitionings AND expressible as unrolled SQL —
the DuckDB oracle value-hash-checks a 5-iteration graph algorithm.

Scale shape per iteration (the classic two-shuffle PageRank step):

1. contribs: ranks ⋈ edges on src — a slim tag-union co-group on a
   coarse splitmix bucket of src (ranks rows carry (node, r, d); edge
   rows carry (src, dst); ONE vectorized pandas merge per bucket), with
   a per-batch partial sum on dst as the combiner;
2. new ranks: (old ranks ∪ contrib partials) co-grouped by node —
   base + damped in-flow; nodes with no in-edges keep the teleport base.

Ranks materialize once per iteration (an iterative lineage would
otherwise replay every prior round). Edges re-shuffle per iteration —
the honest Dataset-level cost; a long-running 100-TB deployment would
pin edge partitions in stateful actors (the IndexShard pattern,
stages/ann.py) and ship only rank deltas.

The graph is used undirected-ized (caller emits both directions), so
every node has out-degree ≥ 1 and the dangling-mass redistribution term
vanishes; total mass shrinks only by floor-division dust, identically
in both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import splitmix64

UNITS = 10**15


def _bucket_of(arr: np.ndarray, num_buckets: int) -> np.ndarray:
    return (splitmix64(arr.astype(np.uint64))
            % np.uint64(num_buckets)).astype(np.int64)


def pagerank(edges: ray.data.Dataset, *, src_col: str = "src",
             dst_col: str = "dst", iters: int = 5,
             num_buckets: int = 64) -> ray.data.Dataset:
    """→ (node: int64, r: int64) — fixed-point PageRank rank-units after
    ``iters`` synchronous iterations over the DISTINCT directed edges.
    Node ids must be int64; callers disambiguate bipartite id spaces
    (e.g. ``2k`` / ``2k+1``) before the call."""
    # distinct edges, once (multi-edges would double-count flow)
    def ekey(b: pa.Table) -> pa.Table:
        return pa.table({
            src_col: pc.cast(b[src_col], pa.int64()),
            dst_col: pc.cast(b[dst_col], pa.int64()),
        })

    def edge_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates([src_col, dst_col])[[src_col, dst_col]]

    def add_src_bucket(b: pa.Table) -> pa.Table:
        kb = _bucket_of(b[src_col].to_numpy(zero_copy_only=False),
                        num_buckets)
        return b.append_column("__kb", pa.array(kb))

    def batch_dedup(b: pa.Table) -> pa.Table:
        t = b.group_by([src_col, dst_col]).aggregate([])
        return t

    dedges = (edges.map_batches(ekey, batch_format="pyarrow")
              .map_batches(batch_dedup, batch_format="pyarrow")  # combiner
              .map_batches(add_src_bucket, batch_format="pyarrow")
              .groupby("__kb").map_groups(edge_dedup,
                                          batch_format="pandas")
              .materialize())

    # out-degree per src == per-node degree (both directions present)
    from ray.data.aggregate import Sum

    def deg_partial(b: pa.Table) -> pa.Table:
        g = b.group_by([src_col]).aggregate([([], "count_all")])
        return g.rename_columns(["node", "__d"])

    deg = (dedges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("__d", alias_name="d"))
           .materialize())
    n_nodes = deg.count()
    base = (15 * UNITS) // (100 * n_nodes)
    r0 = UNITS // n_nodes

    def init(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["node"],
            "r": pa.array(np.full(len(b), r0, np.int64)),
            "d": pc.cast(b["d"], pa.int64()),
        })

    ranks = deg.map_batches(init, batch_format="pyarrow").materialize()

    def tag_rank(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": b["node"], "v1": b["r"], "v2": b["d"],
            "__side": pa.array(np.zeros(len(b), np.int8)),
            "__kb": pa.array(_bucket_of(node, num_buckets)),
        })

    def tag_edge(b: pa.Table) -> pa.Table:
        src = b[src_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": b[src_col], "v1": b[dst_col],
            "v2": pa.array(np.zeros(len(b), np.int64)),
            "__side": pa.array(np.ones(len(b), np.int8)),
            "__kb": pa.array(_bucket_of(src, num_buckets)),
        })

    def contrib(group: pd.DataFrame) -> pd.DataFrame:
        rk = group[group["__side"] == 0]
        eg = group[group["__side"] == 1]
        m = eg[["k", "v1"]].merge(
            rk[["k", "v1", "v2"]].rename(columns={"v1": "r", "v2": "d"}),
            on="k", how="inner")
        c = (85 * m["r"].to_numpy(np.int64)) // (100 * m["d"].to_numpy(np.int64))
        out = pd.DataFrame({"dst": m["v1"].to_numpy(np.int64), "c": c})
        # in-bucket combiner: one row per dst leaves the kernel
        return out.groupby("dst", as_index=False)["c"].sum()

    def tag_contrib(b: pa.Table) -> pa.Table:
        dst = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": b["dst"], "v1": b["c"],
            "v2": pa.array(np.zeros(len(b), np.int64)),
            "__side": pa.array(np.ones(len(b), np.int8)),
            "__kb": pa.array(_bucket_of(dst, num_buckets)),
        })

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        rk = group[group["__side"] == 0]
        cb = group[group["__side"] == 1]
        s = cb.groupby("k", as_index=False)["v1"].sum() \
            .rename(columns={"v1": "s"})
        m = rk[["k", "v2"]].merge(s, on="k", how="left")
        r = base + m["s"].fillna(0).to_numpy(np.int64)
        return pd.DataFrame({"node": m["k"].to_numpy(np.int64), "r": r,
                             "d": m["v2"].to_numpy(np.int64)})

    tagged_edges = dedges.map_batches(tag_edge, batch_format="pyarrow")
    for _ in range(iters):
        contribs = (ranks.map_batches(tag_rank, batch_format="pyarrow")
                    .union(tagged_edges)
                    .groupby("__kb").map_groups(contrib,
                                                batch_format="pandas"))
        # repartition before materializing: map_groups emits one block
        # per bucket (plus untyped empties) and the union doubles block
        # counts — without rebuilding, fragmentation compounds per
        # iteration and scheduling overhead grows superlinearly
        ranks = (ranks.map_batches(tag_rank, batch_format="pyarrow")
                 .union(contribs.map_batches(tag_contrib,
                                             batch_format="pyarrow"))
                 .groupby("__kb").map_groups(apply, batch_format="pandas")
                 .repartition(min(num_buckets, 16))
                 .materialize())

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "r": b["r"]})

    return ranks.map_batches(fin, batch_format="pyarrow")
