"""Resident edge-shard actors for the iterative graph family.

The Dataset-shuffle implementations in stages/graph.py and
stages/clustering.py re-shuffle the FULL edge list every iteration —
O(iters × |E|) network, the one scale-killer-shaped cost left in the
engine (round-4 verdict). This module pins the edge partitions in
long-lived actors ONCE (the `IndexShard` pattern, stages/ann.py:64) and
ships only per-iteration deltas:

- build: one `map_batches` pass routes each edge batch to its shard by
  ``splitmix64(src) % num_shards`` (worker→actor, never through the
  driver); each shard seals into two cache-friendly orderings — a CSR by
  src (frontier expansion, per-node degree) and a (dst-owner, dst)
  grouping with precomputed ``reduceat`` segment starts (per-iteration
  combiner sums/mins are one vectorized call, exact int64).
- iterate: each shard pre-combines its outgoing messages PER DESTINATION
  (one row per distinct dst per target shard) and exposes them as object
  refs; the driver routes only the refs (S² tiny handles), targets fetch
  peer-to-peer through the object store. Per-iteration network is
  O(#distinct boundary dsts), not O(|E|).
- results come back as per-shard Arrow tables via
  ``ray.data.from_arrow_refs`` — no driver-side concat of node rows.

Semantics are BIT-IDENTICAL to the shuffle paths (equivalence-tested):
pagerank uses the same exact fixed-point update (graph.py:9), BFS the
same level-synchronous min-hop, connected components the same hash-min +
pointer-jumping label propagation (clustering.py:1) with EXACT
convergence detection (changed-label counts, not a probabilistic
checksum — the actors make the count free).

Shard actors take ``num_cpus=0`` by default: in local mode a fixed pool
of full-CPU actors starves the task operators that feed the build
(verify-skill deadlock gotcha); the exchange kernels are GIL-releasing
numpy, so oversubscription is benign. On a real multi-node cluster, pass
``actor_num_cpus=1`` to give each shard a core and set ``num_shards`` ≈
cluster cores / 2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import splitmix64

UNITS = 10**15  # fixed-point rank mass — must match stages/graph.py


def _owner(ids: np.ndarray, num_shards: int) -> np.ndarray:
    return (splitmix64(ids.astype(np.uint64))
            % np.uint64(num_shards)).astype(np.int64)


def _expand_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenated index ranges [starts[i], starts[i]+counts[i]) — the
    vectorized CSR gather (no Python loop over frontier nodes)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    base = np.repeat(starts - np.concatenate(
        [[np.int64(0)], np.cumsum(counts)[:-1]]), counts)
    return base + np.arange(total, dtype=np.int64)


@ray.remote
class EdgeShard:
    """One hash-partition of the directed edge list, resident across
    iterations. Owns every out-edge of its nodes (partitioned by src),
    hence their degrees, ranks/hops/labels — the per-node state."""

    def __init__(self, shard_id: int, num_shards: int,
                 weighted: bool = False):
        self.sid = shard_id
        self.S = num_shards
        self.weighted = weighted
        self._src: list[np.ndarray] = []
        self._dst: list[np.ndarray] = []
        self._w: list[np.ndarray] = []

    def add(self, src: np.ndarray, dst: np.ndarray,
            w: np.ndarray | None = None) -> int:
        self._src.append(np.asarray(src, np.int64))
        self._dst.append(np.asarray(dst, np.int64))
        if self.weighted:
            self._w.append(np.asarray(w, np.int64) if w is not None
                           else np.ones(len(src), np.int64))
        return len(src)

    def seal(self) -> int:
        """Dedup (src, dst) — on a weighted shard duplicate edges SUM
        their weights (multiplicity semantics); unweighted shards never
        materialize weight state at all (wdeg/e_w stay None — the |E|
        weight column would grow resident edge memory ~50% for
        algorithms that never read it) — and build both orderings +
        segment metadata. All edges of an owned src live here
        (hash-by-src routing), so local dedup == global dedup."""
        src = (np.concatenate(self._src) if self._src
               else np.empty(0, np.int64))
        dst = (np.concatenate(self._dst) if self._dst
               else np.empty(0, np.int64))
        w = ((np.concatenate(self._w) if self._w
              else np.empty(0, np.int64)) if self.weighted else None)
        self._src = self._dst = self._w = []
        # dedup via lexsort on (src, dst); weights sum per kept edge
        o = np.lexsort((dst, src))
        src, dst = src[o], dst[o]
        if self.weighted:
            w = w[o]
        if len(src):
            keep = np.ones(len(src), bool)
            keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
            if self.weighted:
                w = np.add.reduceat(w, np.nonzero(keep)[0])
            src, dst = src[keep], dst[keep]
        # CSR by src (already src-sorted)
        self.nodes, self.deg = (np.unique(src, return_counts=True)
                                if len(src) else
                                (np.empty(0, np.int64),
                                 np.empty(0, np.int64)))
        self.csr_starts = np.concatenate(
            [[np.int64(0)], np.cumsum(self.deg)[:-1]]) \
            if len(self.nodes) else np.empty(0, np.int64)
        self.csr_dst = dst.copy()
        # per-node weighted out-degree (weighted pagerank's denominator)
        self.wdeg = ((np.add.reduceat(w, self.csr_starts)
                      if len(self.nodes) else np.empty(0, np.int64))
                     if self.weighted else None)
        # exchange ordering: sort edges by (dst_owner, dst); precompute
        # per-target slices + reduceat starts over distinct dsts + the
        # local src index of every edge (for gathering per-node values)
        downer = _owner(dst, self.S)
        o2 = np.lexsort((dst, downer))
        e_src, e_dst, e_ow = src[o2], dst[o2], downer[o2]
        self.e_w = w[o2] if self.weighted else None
        self.e_src_li = np.searchsorted(self.nodes, e_src)
        self.tgt_slices: list[tuple[int, int]] = []
        self.tgt_u: list[np.ndarray] = []
        self.tgt_starts: list[np.ndarray] = []
        bounds = np.searchsorted(e_ow, np.arange(self.S + 1))
        for t in range(self.S):
            lo, hi = int(bounds[t]), int(bounds[t + 1])
            d = e_dst[lo:hi]
            if len(d):
                new = np.ones(len(d), bool)
                new[1:] = d[1:] != d[:-1]
                starts = np.nonzero(new)[0]
                u = d[starts]
            else:
                starts = np.empty(0, np.int64)
                u = np.empty(0, np.int64)
            self.tgt_slices.append((lo, hi))
            self.tgt_u.append(u)
            self.tgt_starts.append(starts)
        self._e_edges = len(e_src)
        return len(self.nodes)

    def n_nodes(self) -> int:
        return len(self.nodes)

    # ---------------- PageRank ----------------

    def pr_init(self, n_total: int) -> None:
        self.n_total = n_total
        r0 = UNITS // n_total
        self.r = np.full(len(self.nodes), r0, np.int64)
        self.base = (15 * UNITS) // (100 * n_total)

    def pr_contribs(self, weighted: bool = False) -> list:
        """Per-target pre-combined (dst, Σ contribution) — exact int64
        reduceat over the sealed segment starts. Returns S object refs;
        per-iteration exchange is O(distinct dsts), never O(|E|).

        ``weighted``: each edge carries w × the per-unit-weight share
        ``(85·r) // (100·wdeg)`` — the division happens per NODE first
        so no intermediate exceeds int64 (r·w would overflow at
        UNITS-scale ranks), and the identical expression replays in
        SQL bigints."""
        if weighted and not self.weighted:
            raise ValueError("weighted pagerank needs a GraphEngine "
                             "built with weight_col")
        if not len(self.nodes):
            cnode = np.empty(0, np.int64)
        elif weighted:
            cnode = (85 * self.r) // (100 * self.wdeg)
        else:
            cnode = (85 * self.r) // (100 * self.deg)
        c_edge = cnode[self.e_src_li]
        if weighted:
            c_edge = c_edge * self.e_w
        out = []
        for t in range(self.S):
            lo, hi = self.tgt_slices[t]
            seg = c_edge[lo:hi]
            sums = (np.add.reduceat(seg, self.tgt_starts[t])
                    if len(seg) else np.empty(0, np.int64))
            out.append(ray.put((self.tgt_u[t], sums)))
        return out

    def _own_idx(self, u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Local indices of the owned subset of ``u`` (mask, idx) —
        unknown ids (e.g. dsts of a not-pre-doubled graph) are dropped,
        matching the shuffle paths' join-on-node semantics."""
        idx = np.searchsorted(self.nodes, u)
        ok = idx < len(self.nodes)
        ok[ok] = self.nodes[idx[ok]] == u[ok]
        return ok, idx[ok]

    def pr_apply(self, refs: list) -> None:
        acc = np.zeros(len(self.nodes), np.int64)
        for ref in refs:
            u, s = ray.get(ref)
            if len(u):
                ok, idx = self._own_idx(u)
                np.add.at(acc, idx, s[ok])
        self.r = self.base + acc

    def pr_result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, pa.int64()),
                         "r": pa.array(self.r, pa.int64())})

    # ---------------- BFS ----------------

    def bfs_init(self, seeds: np.ndarray) -> None:
        self.hop = np.full(len(self.nodes), -1, np.int64)
        seeds = np.asarray(seeds, np.int64)
        mine = seeds[_owner(seeds, self.S) == self.sid]
        idx = np.searchsorted(self.nodes, mine)
        ok = (idx < len(self.nodes))
        ok[ok] = self.nodes[idx[ok]] == mine[ok]
        self.hop[idx[ok]] = 0
        # SINK nodes (no out-edges here — seeds absent from the src set,
        # and on directed graphs any dst-only node) still carry a hop,
        # matching the shuffle path's label table. Sorted arrays, grown
        # per level in bfs_apply.
        self.xnodes = np.unique(mine[~ok])
        self.xhop = np.zeros(len(self.xnodes), np.int64)

    def bfs_expand(self, h: int) -> list:
        """Out-neighbors of this shard's level-h frontier, deduped and
        split by owner. Returns S refs of distinct dst arrays."""
        f = np.nonzero(self.hop == h)[0]
        idx = _expand_ranges(self.csr_starts[f], self.deg[f])
        d = np.unique(self.csr_dst[idx])
        ow = _owner(d, self.S)
        return [ray.put(d[ow == t]) for t in range(self.S)]

    def bfs_apply(self, refs: list, h: int) -> int:
        newly = 0
        sinks: list[np.ndarray] = []
        for ref in refs:
            u = ray.get(ref)
            if not len(u):
                continue
            ok, sel = self._own_idx(u)
            fresh = sel[self.hop[sel] == -1]
            self.hop[fresh] = h + 1
            newly += len(fresh)
            if not ok.all():
                sinks.append(u[~ok])
        if sinks:
            cand = np.unique(np.concatenate(sinks))
            pos = np.searchsorted(self.xnodes, cand)
            seen = pos < len(self.xnodes)
            seen[seen] = self.xnodes[pos[seen]] == cand[seen]
            new = cand[~seen]
            if len(new):
                self.xnodes = np.concatenate([self.xnodes, new])
                self.xhop = np.concatenate(
                    [self.xhop, np.full(len(new), h + 1, np.int64)])
                o = np.argsort(self.xnodes, kind="mergesort")
                self.xnodes, self.xhop = self.xnodes[o], self.xhop[o]
                newly += len(new)
        return newly

    def bfs_result(self) -> pa.Table:
        m = self.hop >= 0
        node = np.concatenate([self.nodes[m], self.xnodes])
        hop = np.concatenate([self.hop[m], self.xhop])
        return pa.table({"node": pa.array(node, pa.int64()),
                         "hop": pa.array(hop, pa.int64())})

    # ---------------- Connected components (hash-min) ----------------

    def cc_init(self) -> None:
        """L0(n) = min(n, min direct neighbor) — fully local (all
        out-edges of an owned node are here; the graph is pre-doubled)."""
        if len(self.nodes):
            nmin = np.minimum.reduceat(self.csr_dst, self.csr_starts)
            self.label = np.minimum(self.nodes, nmin)
        else:
            self.label = np.empty(0, np.int64)

    def cc_msgs(self) -> list:
        """Per-target per-dst min of L(src) over local edges — the
        hash-min message combiner as one reduceat per target."""
        l_edge = self.label[self.e_src_li]
        out = []
        for t in range(self.S):
            lo, hi = self.tgt_slices[t]
            seg = l_edge[lo:hi]
            mins = (np.minimum.reduceat(seg, self.tgt_starts[t])
                    if len(seg) else np.empty(0, np.int64))
            out.append(ray.put((self.tgt_u[t], mins)))
        return out

    def cc_apply(self, refs: list) -> int:
        before = self.label.copy()
        for ref in refs:
            u, m = ray.get(ref)
            if len(u):
                ok, idx = self._own_idx(u)
                np.minimum.at(self.label, idx, m[ok])
        return int((self.label != before).sum())

    def cc_jump_requests(self) -> list:
        """Distinct current labels, split by owner — the pointer-jumping
        lookup set L(L(n)). A label is always a node id of the graph, so
        its owner shard can answer."""
        self._jump_u = np.unique(self.label)
        ow = _owner(self._jump_u, self.S)
        self._jump_split = [self._jump_u[ow == t] for t in range(self.S)]
        return [ray.put(x) for x in self._jump_split]

    def cc_lookup(self, q: np.ndarray) -> np.ndarray:
        # the request ref arrives as a TOP-LEVEL arg, so Ray has already
        # dereferenced it (nested refs, as in *_apply, have not)
        if not len(q):
            return q
        idx = np.searchsorted(self.nodes, q)
        # every queried label is an existing node (component min) — but
        # guard anyway so a malformed graph fails loudly, not silently
        if (idx >= len(self.nodes)).any() or \
                not np.array_equal(self.nodes[np.minimum(
                    idx, len(self.nodes) - 1)], q):
            raise ValueError("pointer-jump lookup hit a non-node label")
        return self.label[idx]

    def cc_jump_apply(self, refs: list) -> int:
        """L ← min(L, L(L)) using the answered lookups. ``refs`` are the
        peer shards' cc_lookup result refs, fetched actor-to-actor."""
        if not len(self.label):
            return 0
        lut_k = np.concatenate(self._jump_split) \
            if self._jump_split else np.empty(0, np.int64)
        lut_v = np.concatenate([ray.get(r) for r in refs]) \
            if refs else np.empty(0, np.int64)
        o = np.argsort(lut_k, kind="mergesort")
        lut_k, lut_v = lut_k[o], lut_v[o]
        ll = lut_v[np.searchsorted(lut_k, self.label)]
        new = np.minimum(self.label, ll)
        changed = int((new != self.label).sum())
        self.label = new
        return changed

    def cc_result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, pa.int64()),
                         "label": pa.array(self.label, pa.int64())})

    # ---------------- k-core (synchronous peeling) ----------------

    def kcore_init(self, k: int) -> None:
        """Peeling state over the pre-doubled graph: every owned node
        starts alive with its full degree (all its out-edges are local,
        so ``deg`` IS the undirected degree)."""
        self.k = k
        self.alive = np.ones(len(self.nodes), bool)
        self.cur = self.deg.astype(np.int64).copy()

    def kcore_peel(self) -> tuple[int, list]:
        """One synchronous peel wave: kill every alive node whose
        current degree is below k, then emit per-target (dst, count)
        decrements for the killed nodes' out-neighbors — the same
        pre-combined reduceat shape as pr_contribs, so the exchange is
        O(distinct affected neighbors), never O(|E|). The wave is
        simultaneous (membership checked BEFORE this round's
        decrements land), so the fixpoint is the unique k-core
        regardless of sharding."""
        newly = self.alive & (self.cur < self.k)
        self.alive[newly] = False
        f = np.nonzero(newly)[0]
        idx = _expand_ranges(self.csr_starts[f], self.deg[f])
        d = self.csr_dst[idx]
        u, c = (np.unique(d, return_counts=True) if len(d)
                else (np.empty(0, np.int64), np.empty(0, np.int64)))
        ow = _owner(u, self.S)
        out = [ray.put((u[ow == t], c[ow == t].astype(np.int64)))
               for t in range(self.S)]
        return int(newly.sum()), out

    def kcore_apply(self, refs: list) -> None:
        """Apply peer decrements. Dead nodes' counters may keep
        dropping — harmless, they can never re-enter ``alive``."""
        for ref in refs:
            u, c = ray.get(ref)
            if len(u):
                ok, idx = self._own_idx(u)
                np.subtract.at(self.cur, idx, c[ok])

    def kcore_result(self) -> pa.Table:
        """Surviving nodes with their within-core degree (``cur`` at the
        fixpoint counts alive neighbors only — every dead neighbor has
        decremented it exactly once per edge)."""
        m = self.alive
        return pa.table({"node": pa.array(self.nodes[m], pa.int64()),
                         "core_deg": pa.array(self.cur[m], pa.int64())})


class GraphEngine:
    """Driver-side handle over the resident edge shards. Build once, run
    any of the iterative algorithms, ``shutdown()`` (or use as a context
    manager) to release the actors."""

    def __init__(self, edges: ray.data.Dataset, *, num_shards: int = 8,
                 src_col: str = "src", dst_col: str = "dst",
                 weight_col: str | None = None,
                 actor_num_cpus: float = 0):
        self.S = num_shards
        self.shards = [
            EdgeShard.options(num_cpus=actor_num_cpus).remote(
                s, num_shards, weight_col is not None)
            for s in range(num_shards)]
        shards = self.shards
        S = num_shards

        def push(b: pa.Table) -> pa.Table:
            src = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
            w = (b[weight_col].to_numpy(zero_copy_only=False)
                 .astype(np.int64) if weight_col else None)
            ow = _owner(src, S)
            pend = []
            for s in range(S):
                m = ow == s
                if m.any():
                    pend.append(shards[s].add.remote(
                        src[m], dst[m], w[m] if w is not None else None))
            ray.get(pend)  # backpressure: don't outrun the actors
            return pa.table({"n": pa.array([len(src)], pa.int64())})

        # one streaming pass routes every edge batch worker→actor
        edges.map_batches(push, batch_format="pyarrow").sum("n")
        counts = ray.get([s.seal.remote() for s in self.shards])
        self.n_nodes = int(sum(counts))

    # -- pagerank: same exact fixed-point update as stages/graph.py --
    def pagerank(self, *, iters: int = 5,
                 weighted: bool = False) -> ray.data.Dataset:
        """``weighted=True`` splits each node's outgoing 85% share per
        unit of edge weight ((85·r)//(100·wdeg) × w per edge — exact
        int64, SQL-replayable; build the engine with ``weight_col``)."""
        ray.get([s.pr_init.remote(self.n_nodes) for s in self.shards])
        for _ in range(iters):
            outs = ray.get([s.pr_contribs.remote(weighted)
                            for s in self.shards])
            ray.get([self.shards[t].pr_apply.remote(
                [outs[i][t] for i in range(self.S)])
                for t in range(self.S)])
        return ray.data.from_arrow_refs(
            [s.pr_result.remote() for s in self.shards])

    def bfs(self, *, seeds, max_hops: int = 6) -> ray.data.Dataset:
        ray.get([s.bfs_init.remote(np.asarray(sorted(set(int(x) for x in seeds)),
                                              np.int64))
                 for s in self.shards])
        for h in range(max_hops):
            outs = ray.get([s.bfs_expand.remote(h) for s in self.shards])
            newly = ray.get([self.shards[t].bfs_apply.remote(
                [outs[i][t] for i in range(self.S)], h)
                for t in range(self.S)])
            if sum(newly) == 0:
                break
        return ray.data.from_arrow_refs(
            [s.bfs_result.remote() for s in self.shards])

    def connected_components(self, *, max_iters: int = 50) -> ray.data.Dataset:
        ray.get([s.cc_init.remote() for s in self.shards])
        for _ in range(max_iters):
            outs = ray.get([s.cc_msgs.remote() for s in self.shards])
            changed = sum(ray.get([self.shards[t].cc_apply.remote(
                [outs[i][t] for i in range(self.S)])
                for t in range(self.S)]))
            reqs = ray.get([s.cc_jump_requests.remote()
                            for s in self.shards])
            resp = [[self.shards[t].cc_lookup.remote(reqs[i][t])
                     for t in range(self.S)] for i in range(self.S)]
            changed += sum(ray.get([self.shards[i].cc_jump_apply.remote(
                resp[i]) for i in range(self.S)]))
            if changed == 0:
                break
        return ray.data.from_arrow_refs(
            [s.cc_result.remote() for s in self.shards])

    def kcore(self, *, k: int, max_iters: int = 100) -> ray.data.Dataset:
        """Nodes of the k-core (maximal subgraph with min degree ≥ k)
        plus their within-core degree, by synchronous distributed
        peeling (Montresor et al.-style wave removal). Per-wave network
        is the pre-combined decrement set of that wave's victims —
        each node is killed (and its neighborhood notified) at most
        once over the WHOLE run, so total exchange is O(|E|) no matter
        how many waves, and the edge list never moves after the build.
        Requires a pre-doubled (undirected) edge list, like
        connected_components. Returns (node, core_deg); converged is
        guaranteed — a wave with zero removals everywhere is the
        fixpoint. ``self.last_kcore_rounds`` records the wave count
        (the query oracle's SQL unroll depth is pinned against it)."""
        ray.get([s.kcore_init.remote(k) for s in self.shards])
        self.last_kcore_rounds = 0
        for _ in range(max_iters):
            res = ray.get([s.kcore_peel.remote() for s in self.shards])
            removed = sum(r[0] for r in res)
            if removed == 0:
                break
            self.last_kcore_rounds += 1
            ray.get([self.shards[t].kcore_apply.remote(
                [res[i][1][t] for i in range(self.S)])
                for t in range(self.S)])
        else:
            raise RuntimeError(
                f"k-core peeling did not converge in {max_iters} waves")
        return ray.data.from_arrow_refs(
            [s.kcore_result.remote() for s in self.shards])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []

    def __enter__(self) -> "GraphEngine":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()
