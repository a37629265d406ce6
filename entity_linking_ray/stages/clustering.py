"""Transitive clustering: connected components via iterative hash-min
label propagation — union-find expressed as groupby/join shuffles.

The reference never clusters (it stops at per-mention best link); the
north-star contract requires transitive clusters. Algorithm: hash-min
label propagation with pointer jumping (cf. BTS, ICDE 2024, PAPERS.md;
CC-MR-style shortcutting):

    L0(n)      = min(n, min direct neighbor)         [1 groupby]
    per round:   msgs: L(dst) candidate = L(src) over the pre-doubled
                 edge list                            [1 join]
                 L ← groupby-min(msgs ∪ L)            [1 shuffle agg]
                 L ← min(L, L(L))  (pointer jumping)  [1 self-join]

Pointer jumping halves remaining path depth each round → O(log diameter)
rounds. Convergence detection is a cheap tree-aggregate checksum (two
independent 25-bit masked sums of splitmix64(node ⊕ label) — labels are
monotone non-increasing, so an unchanged double checksum means converged
with error probability ~2^-50), NOT an extra join.

Per-batch combiners pre-aggregate every min before its shuffle; min is
associative so hot keys can be salted without changing results (the
flagship additionally salts hot entity anchors at edge build,
pipelines/link_and_cluster.py).

Node ids are 63-bit hashes (see functions/hashing.py for why not u64);
at 10^12-doc scale ids widen to 128-bit (two int64 columns) — the
dataflow is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Min

_MASK1 = (1 << 25) - 1
_MASK2 = ((1 << 25) - 1) << 25


def _partial_min(batch: pa.Table, key: str = "node", val: str = "label") -> pa.Table:
    """Per-batch combiner: min(label) per node before the shuffle."""
    return batch.group_by(key).aggregate([(val, "min")]).rename_columns([key, val])


_MIN_BUCKETS = 64


def _groupby_min(ds: ray.data.Dataset, key: str = "node", val: str = "label") -> ray.data.Dataset:
    """Distributed min-by-key as: per-batch combiner → hash-bucket column →
    groupby(bucket).map_groups with Arrow's C group_by inside each bucket.

    Ray's native groupby().aggregate(Min) is ~80x slower at 10M rows in
    this release (sort-based aggregate with per-key overhead); bucketing
    keeps the shuffle on a 64-value key and does the real aggregation in
    one vectorized Arrow kernel per bucket."""

    def combine_and_bucket(batch: pa.Table) -> pa.Table:
        part = _partial_min(batch, key, val)
        pcol = (part[key].to_numpy(zero_copy_only=False) % _MIN_BUCKETS).astype(np.int64)
        return part.append_column("__bucket", pa.array(pcol, pa.int64()))

    def bucket_min(group: pa.Table) -> pa.Table:
        return (
            group.group_by(key).aggregate([(val, "min")]).rename_columns([key, val])
        )

    return (
        ds.map_batches(combine_and_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_min, batch_format="pyarrow")
    )


def _checksum(labels: ray.data.Dataset) -> tuple[int, int]:
    """Two independent masked sums over splitmix64(node ^ label) — a tree
    aggregate (no hash shuffle)."""
    from ..functions.hashing import splitmix64

    def hashes(b: pa.Table) -> pa.Table:
        x = np.asarray(b["node"].to_pylist(), dtype=np.uint64)
        y = np.asarray(b["label"].to_pylist(), dtype=np.uint64)
        h = splitmix64(x ^ y)
        return pa.table({
            "h1": pa.array((h & np.uint64(_MASK1)).astype(np.int64), pa.int64()),
            "h2": pa.array(((h & np.uint64(_MASK2)) >> np.uint64(25)).astype(np.int64), pa.int64()),
        })

    hs = labels.map_batches(hashes, batch_format="pyarrow")
    res = hs.sum(["h1", "h2"])
    return (res["sum(h1)"], res["sum(h2)"])


# Below this, the numpy driver path wins outright (~1.5 GB / 30 s at 20M
# edges); above it the distributed loop amortizes (measured ~68 s at 5M
# edges on 8 cpus — dominated by per-round join/shuffle costs, scales out).
SMALL_GRAPH_EDGES = 20_000_000


def connected_components(edges: ray.data.Dataset, max_iters: int = 20,
                         num_partitions: int = 16,
                         small_graph_edges: int = SMALL_GRAPH_EDGES,
                         large_graph_plan: str = "actors") -> ray.data.Dataset:
    """edges(src:int64, dst:int64) → labels(node:int64, label:int64).

    Includes every endpoint node; isolated nodes are the caller's concern
    (they are their own cluster by definition).

    Size-based plan choice (ray_guide.md: "union-find on the driver only if
    the candidate set is provably small"): below ``small_graph_edges`` the
    edge list streams to a driver union-find (identical min-label
    semantics, no shuffle rounds); above it, ``large_graph_plan`` picks the
    distributed engine — ``"actors"`` (default) pins edge partitions in
    resident shard actors and ships only label deltas per round
    (stages/graph_actors.py; per-round network O(boundary dsts), not
    O(|E|)), ``"shuffle"`` keeps the original hash-min + pointer-jumping
    Dataset loop (per-round full-edge join). All plans produce
    label == component-min-node (equivalence-tested).
    """
    edges = edges.select_columns(["src", "dst"])

    def both_dirs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [batch["src"].combine_chunks(), batch["dst"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [batch["dst"].combine_chunks(), batch["src"].combine_chunks()]
                ),
            }
        )

    edges = edges.materialize()  # no-op if the caller already materialized
    n_raw = edges.count()
    if n_raw == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        )
    if n_raw <= small_graph_edges:
        srcs, dsts = [], []
        for b in edges.iter_batches(batch_format="pyarrow"):
            srcs.append(b["src"].to_numpy(zero_copy_only=False))
            dsts.append(b["dst"].to_numpy(zero_copy_only=False))
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        su, du = inv[: len(src)], inv[len(src):]
        label = np.arange(len(nodes), dtype=np.int64)
        # vectorized hash-min + pointer jumping on compact ids (same
        # min-label semantics as the distributed path, all numpy)
        while True:
            before = label
            cand = np.minimum(label[su], label[du])
            label = label.copy()
            np.minimum.at(label, su, cand)
            np.minimum.at(label, du, cand)
            for _ in range(3):  # shortcut: label ← label[label]
                nl = label[label]
                if (nl == label).all():
                    break
                label = nl
            if (label == before).all():
                break
        return ray.data.from_arrow(
            pa.table({"node": pa.array(nodes, pa.int64()),
                      "label": pa.array(nodes[label], pa.int64())})
        )

    if large_graph_plan == "actors":
        from .graph_actors import GraphEngine

        doubled = edges.map_batches(both_dirs, batch_format="pyarrow")
        with GraphEngine(doubled, num_shards=max(8, num_partitions)) as eng:
            out = eng.connected_components(max_iters=max_iters)
            # collect block refs before the actors die: from_arrow_refs
            # blocks are driver-owned actor-task returns, but materialize
            # inside the context pins them against any store eviction race
            return out.materialize()

    doubled = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()
    n_edges = doubled.count()
    # Adapt join parallelism to data size: each hash-join partition costs an
    # aggregator actor spin-up (~100s of ms), which dominates on small
    # graphs. ~1M edge-endpoints per partition, capped by the caller.
    num_partitions = max(2, min(num_partitions, n_edges // 1_000_000 + 2))

    # round 0: label(n) = min(n, min direct neighbor)
    msgs0 = doubled.map_batches(
        lambda b: pa.table({"node": b["src"], "label": b["dst"]}), batch_format="pyarrow"
    )
    self0 = doubled.map_batches(
        lambda b: pa.table({"node": b["src"], "label": b["src"]}), batch_format="pyarrow"
    )
    # .repartition before each join: Ray 2.49's sort-based groupby (inside
    # _groupby_min's map_groups) emits UNTYPED empty blocks for empty
    # partitions; a hash-join partition fed only those fails ("no match
    # for FieldRef"). Repartition rebuilds blocks from real rows. Labels
    # are node-scale rows that the join shuffles anyway — one extra pass.
    labels = _groupby_min(msgs0.union(self0)).repartition(num_partitions).materialize()
    prev_sum = _checksum(labels)

    for _ in range(max_iters):
        # one join: attach src labels, message them to dst
        j = doubled.join(labels, "inner", num_partitions, on=("src",), right_on=("node",))
        msgs = j.map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        new_labels = _groupby_min(msgs.union(labels)).repartition(num_partitions).materialize()

        # pointer jumping (shortcutting): label ← min(label, label(label))
        lj = new_labels.join(new_labels, "left_outer", num_partitions,
                             on=("label",), right_on=("node",),
                             left_suffix="", right_suffix="_r")
        labels = lj.map_batches(
            lambda b: pa.table(
                {"node": b["node"],
                 "label": pc.coalesce(
                     pc.min_element_wise(b["label"], b["label_r"]), b["label"])}
            ),
            batch_format="pyarrow",
        ).materialize()

        cur_sum = _checksum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def union_find_reference(edge_list) -> dict[int, int]:
    """Driver-side union-find oracle for tests (SURVEY.md §7 hard-part 2)."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in list(parent)}
