"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (``ray.put`` once), two-phase top-k (per-batch
partial top-k → per-query merge). Scale path: :func:`ivf_knn` restricts
each query to its top-``nprobe`` coarse buckets (IVF with deterministic
sampled centroids), turning the scan into a bucket-pruned one.

Computation is float64 to match DuckDB's ``list_cosine_similarity`` oracle
ordering on near-ties.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(V: np.ndarray) -> np.ndarray:
    return V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)


def brute_force_knn(ds: ray.data.Dataset, queries: np.ndarray, query_ids,
                    k: int = 5, vec_col: str = "embedding", id_col: str = "vec_id",
                    exclude_self: bool = True) -> ray.data.Dataset:
    """→ (query_id, neighbor_id, rank, cosine), rank 0-based by
    (cosine desc, neighbor_id asc)."""
    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    blob_ref = ray.put((Qn, list(query_ids)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        Q, qids = ray.get(blob_ref)
        V = _normalize(_to_matrix(batch[vec_col].to_pylist()))
        ids = np.asarray(batch[id_col].to_pylist())
        C = Q @ V.T  # [q, n]
        nq, n = C.shape
        kk = min(k + (1 if exclude_self else 0), n)
        # whole-matrix argpartition + flat mask (no per-query Python loop)
        if kk < n:
            part = np.argpartition(-C, kk - 1, axis=1)[:, :kk]
        else:
            part = np.broadcast_to(np.arange(n), (nq, n)).copy()
        rows = np.repeat(np.arange(nq, dtype=np.int64), part.shape[1])
        cols = part.ravel()
        if exclude_self:
            qid_arr = np.asarray(qids)
            keep = ids[cols] != qid_arr[rows]
            rows, cols = rows[keep], cols[keep]
        return pa.table({
            "query_id": pa.array(np.asarray(qids, object)[rows]
                                 if np.asarray(qids).dtype.kind in "OUS"
                                 else np.asarray(qids)[rows]),
            "neighbor_id": pa.array(ids[cols]),
            "cosine": pa.array(C[rows, cols].astype(np.float64),
                               pa.float64()),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def ivf_assignments(ds: ray.data.Dataset, centroids: np.ndarray,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> ray.data.Dataset:
    """Adds ``bucket`` = argmax-cosine centroid per row."""
    Cn = _normalize(centroids)
    c_ref = ray.put(Cn)

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        V = _normalize(_to_matrix(batch[vec_col].to_pylist()))
        b = np.argmax(V @ C.T, axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def sample_centroids(ds: ray.data.Dataset, n_centroids: int,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> np.ndarray:
    """Deterministic coarse centroids: the vectors whose id hash is
    globally smallest. DISTRIBUTED: each task emits its batch's partial
    min-n rows (argpartition, vectorized), the driver merges only
    num_blocks x n_centroids candidate rows — never the full table."""
    from ..functions.hashing import hash_strings

    def partial(b: pa.Table) -> pa.Table:
        h = hash_strings([str(x) for x in b[id_col].to_pylist()])
        if len(h) > n_centroids:
            idx = np.argpartition(h, n_centroids - 1)[:n_centroids]
        else:
            idx = np.arange(len(h))
        take = pa.array(np.sort(idx), pa.int64())
        return pa.table({"h": pa.array(h[np.sort(idx)], pa.int64()),
                         vec_col: b[vec_col].take(take)})

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pyarrow")
    rows = parts.take_all()  # bounded: num_blocks x n_centroids
    rows.sort(key=lambda r: r["h"])
    return np.stack([np.asarray(r[vec_col], dtype=np.float64)
                     for r in rows[:n_centroids]])


def ivf_knn(ds: ray.data.Dataset, queries: np.ndarray, query_ids, k: int = 5,
            n_centroids: int = 16, nprobe: int = 4,
            vec_col: str = "embedding", id_col: str = "vec_id",
            exclude_self: bool = True,
            centroids: "np.ndarray | None" = None) -> ray.data.Dataset:
    """Bucket-pruned approximate k-NN: per query only rows in its top-nprobe
    centroid buckets are scanned. ``centroids`` overrides the hash-sampled
    default (pass :func:`kmeans_fit` output for trained buckets)."""
    cents = (centroids if centroids is not None
             else sample_centroids(ds, n_centroids, vec_col, id_col))
    assigned = ivf_assignments(ds, cents, vec_col, id_col)
    Cn = _normalize(cents)
    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(Qn @ Cn.T), axis=1)[:, :nprobe]  # [q, nprobe]
    blob_ref = ray.put((Qn, list(query_ids), probes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        Q, qids, prb = ray.get(blob_ref)
        V = _normalize(_to_matrix(batch[vec_col].to_pylist()))
        ids = np.asarray(batch[id_col].to_pylist())
        buckets = np.asarray(batch["bucket"].to_pylist())
        C = Q @ V.T
        out_q, out_n, out_c = [], [], []
        for qi in range(len(Q)):
            mask = np.isin(buckets, prb[qi])
            if exclude_self:
                mask &= ids != qids[qi]
            idxs = np.nonzero(mask)[0]
            if len(idxs) == 0:
                continue
            take = idxs[np.argpartition(-C[qi, idxs], min(k, len(idxs)) - 1)[:k]] \
                if len(idxs) > k else idxs
            for j in take:
                out_q.append(qids[qi])
                out_n.append(ids[j])
                out_c.append(float(C[qi, j]))
        return pa.table({
            "query_id": pa.array(out_q), "neighbor_id": pa.array(out_n),
            "cosine": pa.array(out_c, pa.float64()),
        })

    partials = assigned.map_batches(partial_topk, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def cosine_self_join(ds: ray.data.Dataset, *, threshold: float,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     num_tiles: int = 8,
                     per_group_top_k: "int | None" = None) -> ray.data.Dataset:
    """EXACT all-pairs cosine similarity self-join above ``threshold`` —
    fully distributed triangle tile join (no driver-side collect of the
    embedding table; the LSH variant in stages/dedup.py remains the scale
    path when the threshold is high enough to prune).

    Plan: each row is hashed to one of ``num_tiles`` tiles; every row
    replicates to the ``num_tiles`` unordered tile-pair groups it belongs
    to (the classic triangle all-pairs join), and each (i, j) group does
    one tile×tile matmul — diagonal groups take the upper triangle, off-
    diagonal groups the full cross. Every pair is computed in EXACTLY one
    group. Shuffle volume is O(n·num_tiles) vector rows against O(n²)
    comparison work, so num_tiles ~ sqrt(cluster width) keeps both the
    replication factor modest and the per-group matmul
    (n/num_tiles)²-sized. Output: (id_a, id_b, cosine) with id_a < id_b."""
    T = num_tiles

    def explode(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"__pair": pa.array([], pa.int64()),
                             "__tile": pa.array([], pa.int64()),
                             id_col: b[id_col], vec_col: b[vec_col]})
        if pa.types.is_integer(b[id_col].type):
            from ..functions.hashing import splitmix64

            g = (splitmix64(b[id_col].to_numpy(zero_copy_only=False)
                            .astype(np.uint64)) % np.uint64(T)).astype(np.int64)
        else:
            from ..functions.hashing import hash_strings

            g = hash_strings([str(x) for x in b[id_col].to_pylist()]) % T
        n = b.num_rows
        gi = np.repeat(g, T)
        h = np.tile(np.arange(T, dtype=np.int64), n)
        pair = np.minimum(gi, h) * T + np.maximum(gi, h)
        # h == g contributes the diagonal group exactly once; other h once
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), T), pa.int64())
        return pa.table({
            "__pair": pa.array(pair, pa.int64()),
            "__tile": pa.array(gi, pa.int64()),
            id_col: b[id_col].take(idx),
            vec_col: b[vec_col].take(idx),
        })

    def pairs(group: pa.Table) -> pa.Table:
        # Arrow-native: the vector matrix comes off the flattened list
        # buffer in one reshape (fixed-d embeddings; no per-row stack),
        # first-occurrence dedup via np.unique — no pandas frame
        pk = int(group["__pair"][0].as_py())
        i, j = pk // T, pk % T
        ids_np = group[id_col].to_numpy(zero_copy_only=False)
        tiles = group["__tile"].to_numpy(zero_copy_only=False)
        flat = np.asarray(group[vec_col].combine_chunks().flatten(),
                          dtype=np.float64)
        M = flat.reshape(len(group), flat.size // max(len(group), 1))

        def out_empty() -> pa.Table:
            return pa.table({"id_a": group[id_col].slice(0, 0),
                             "id_b": group[id_col].slice(0, 0),
                             "cosine": pa.array([], pa.float64())})

        def first_uniq(sel: np.ndarray) -> np.ndarray:
            _, ui = np.unique(ids_np[sel], return_index=True)
            return sel[np.sort(ui)]

        if i == j:
            sel = first_uniq(np.nonzero(tiles == i)[0])
            if len(sel) < 2:
                return out_empty()
            ids = ids_np[sel]
            V = _normalize(M[sel])
            C = V @ V.T
            iu, ju = np.triu_indices(len(sel), k=1)
            keep = C[iu, ju] >= threshold
            # group rows need not arrive id-ascending — normalize like the
            # off-diagonal branch so the id_a < id_b contract always holds
            a = np.minimum(ids[iu[keep]], ids[ju[keep]])
            b_ = np.maximum(ids[iu[keep]], ids[ju[keep]])
            cos = C[iu[keep], ju[keep]]
        else:
            si = first_uniq(np.nonzero(tiles == i)[0])
            sj = first_uniq(np.nonzero(tiles == j)[0])
            if not len(si) or not len(sj):
                return out_empty()
            ia, ib = ids_np[si], ids_np[sj]
            C = _normalize(M[si]) @ _normalize(M[sj]).T
            ii, jj = np.nonzero(C >= threshold)
            a = np.minimum(ia[ii], ib[jj])
            b_ = np.maximum(ia[ii], ib[jj])
            cos = C[ii, jj]
        order = np.argsort(a, kind="stable")
        a, b_, cos = a[order], b_[order], cos[order]
        if per_group_top_k is not None:
            # tournament partial: each tile-pair group owns each of its
            # pairs exactly once, so its local top-k bounds the merge;
            # (cosine desc, id_a, id_b) — same total order as before
            o2 = np.lexsort((b_, a, -cos))[:per_group_top_k]
            a, b_, cos = a[o2], b_[o2], cos[o2]
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b_),
                         "cosine": pa.array(cos, pa.float64())})

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("__pair").map_groups(pairs, batch_format="pyarrow"))


_KM_SCALE = 1_000_000  # fixed-point quantization for the k-means reduce


def kmeans_fit(ds: ray.data.Dataset, *, k: int, iters: int = 5,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> np.ndarray:
    """Distributed Lloyd k-means over unit vectors (cosine assignment),
    BIT-REPRODUCIBLE across partitionings: each block accumulates its
    per-centroid sums as int64 fixed-point (unit vectors quantized to
    1e-6), so the groupby reduce is exact integer addition — associative
    and commutative — and the new centroid is ``sum // count``. The same
    input always trains the same centroids no matter the block order
    (the float path would drift in the last bits and flip near-tie
    assignments between runs — poison for resumable lineage).

    Per iteration: one map_batches (assign + local accumulate → ≤ k slim
    rows per block: cid, d×8-byte sum blob, count) and one k-row groupby
    — the classic combiner-shaped k-means step; the k final rows land on
    the driver (k × d ints, broadcast back as next iteration's model).
    Empty clusters keep their previous centroid. Init =
    :func:`sample_centroids` (deterministic hash-min rows)."""
    cents_fx = np.round(
        _normalize(sample_centroids(ds, k, vec_col, id_col))
        * _KM_SCALE).astype(np.int64)
    slim = ds.select_columns([id_col, vec_col]).materialize()

    for _ in range(iters):
        c_ref = ray.put(cents_fx)

        def accumulate(b: pa.Table) -> pa.Table:
            C = ray.get(c_ref).astype(np.float64)
            Cn = _normalize(C)
            V = _normalize(_to_matrix(b[vec_col].to_pylist()))
            cid = np.argmax(V @ Cn.T, axis=1)  # ties → lowest index
            Q = np.round(V * _KM_SCALE).astype(np.int64)
            out_c, out_s, out_n = [], [], []
            for c in np.unique(cid):
                rows = Q[cid == c]
                out_c.append(int(c))
                out_s.append(rows.sum(axis=0, dtype=np.int64).tobytes())
                out_n.append(len(rows))
            return pa.table({"cid": pa.array(out_c, pa.int64()),
                             "s": pa.array(out_s, pa.binary()),
                             "n": pa.array(out_n, pa.int64())})

        def merge(group: pd.DataFrame) -> pd.DataFrame:
            s = np.sum([np.frombuffer(x, np.int64) for x in group["s"]],
                       axis=0, dtype=np.int64)
            n = int(group["n"].sum())
            return pd.DataFrame({"cid": [int(group["cid"].iloc[0])],
                                 "s": [s.tobytes()], "n": [n]})

        rows = (slim.map_batches(accumulate, batch_format="pyarrow")
                .groupby("cid").map_groups(merge, batch_format="pandas")
                .take_all())  # ≤ k rows
        new_fx = cents_fx.copy()  # empty clusters keep their centroid
        for r in rows:
            s = np.frombuffer(r["s"], np.int64)
            new_fx[int(r["cid"])] = s // int(r["n"])
        cents_fx = new_fx

    return cents_fx.astype(np.float64) / _KM_SCALE


@ray.remote
class _KMeansShard:
    """Resident vector shard for the iterative Lloyd loop (the
    graph_actors pattern applied to k-means): vectors are pushed once,
    normalized and quantized once at seal; each iteration is ONE actor
    RPC — broadcast fixed-point centroids in, ≤ k slim (cid, sum blob,
    count) rows out — instead of a full map_batches + groupby + take_all
    Dataset pass per iteration."""

    def __init__(self):
        self._parts: list[np.ndarray] = []

    def add(self, V: np.ndarray) -> int:
        self._parts.append(np.asarray(V, np.float64))
        return len(V)

    def seal(self) -> int:
        V = (np.vstack(self._parts) if self._parts
             else np.empty((0, 0), np.float64))
        self._parts = []
        self.V = _normalize(V) if len(V) else V
        self.Q = np.round(self.V * _KM_SCALE).astype(np.int64)
        return len(self.V)

    def step(self, cents_fx: np.ndarray):
        """One Lloyd assignment + exact int64 accumulate over this
        shard's rows — identical math to kmeans_fit's accumulate."""
        if not len(self.V):
            return (np.empty(0, np.int64), np.empty((0, 0), np.int64),
                    np.empty(0, np.int64))
        Cn = _normalize(cents_fx.astype(np.float64))
        cid = np.argmax(self.V @ Cn.T, axis=1)  # ties → lowest index
        cids = np.unique(cid)
        sums = np.empty((len(cids), self.Q.shape[1]), np.int64)
        counts = np.empty(len(cids), np.int64)
        for i, c in enumerate(cids):
            rows = self.Q[cid == c]
            sums[i] = rows.sum(axis=0, dtype=np.int64)
            counts[i] = len(rows)
        return cids, sums, counts


def kmeans_fit_actors(ds: ray.data.Dataset, *, k: int, iters: int = 5,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      num_shards: int = 8) -> np.ndarray:
    """Resident-shard Lloyd k-means — BIT-IDENTICAL centroids to
    :func:`kmeans_fit` (same deterministic init, same exact int64
    fixed-point reduce; integer addition is order-free, so shard
    partials merge to the same totals as the Dataset groupby). The
    vectors ship to actors once; per-iteration traffic is k×d ints each
    way per shard. Equivalence-tested against kmeans_fit."""
    cents_fx = np.round(
        _normalize(sample_centroids(ds, k, vec_col, id_col))
        * _KM_SCALE).astype(np.int64)
    shards = [_KMeansShard.options(num_cpus=0).remote()
              for _ in range(num_shards)]

    def push(b: pa.Table) -> pa.Table:
        V = _to_matrix(b[vec_col].to_pylist())
        # deterministic routing not required: the reduce is exact and
        # order-free, so any split yields the same centroids
        splits = np.array_split(np.arange(len(V)), num_shards)
        ray.get([shards[s].add.remote(V[idx])
                 for s, idx in enumerate(splits) if len(idx)])
        return pa.table({"n": pa.array([len(V)], pa.int64())})

    ds.select_columns([vec_col]).map_batches(
        push, batch_format="pyarrow").sum("n")
    ray.get([s.seal.remote() for s in shards])

    try:
        for _ in range(iters):
            parts = ray.get([s.step.remote(cents_fx) for s in shards])
            new_fx = cents_fx.copy()  # empty clusters keep their centroid
            tot_s = np.zeros((len(cents_fx), cents_fx.shape[1]), np.int64)
            tot_n = np.zeros(len(cents_fx), np.int64)
            for cids, sums, counts in parts:
                if len(cids):
                    np.add.at(tot_n, cids, counts)
                    np.add.at(tot_s, cids, sums)
            nz = tot_n > 0
            new_fx[nz] = tot_s[nz] // tot_n[nz, None]
            cents_fx = new_fx
    finally:
        for s in shards:
            ray.kill(s)

    return cents_fx.astype(np.float64) / _KM_SCALE


def top_cosine_pairs(ds: ray.data.Dataset, *, k: int,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     num_tiles: int = 8) -> ray.data.Dataset:
    """→ (id_a, id_b, rn) — the k GLOBALLY most-similar vector pairs
    (cosine desc, ties by ids), threshold-free: the dedup-audit shape
    ("show me the 20 closest document pairs" before choosing a near-dup
    threshold). Reuses the exact triangle tile join; every tile-pair
    group emits only its LOCAL top-k (each unordered pair is computed in
    exactly one group, so local top-k is a sound tournament partial) and
    the final single-group merge sees ≤ k · num_tiles·(num_tiles+1)/2
    rows — never the n² pair set."""
    parts = cosine_self_join(ds, threshold=-np.inf, vec_col=vec_col,
                             id_col=id_col, num_tiles=num_tiles,
                             per_group_top_k=k)

    def const(b: pa.Table) -> pa.Table:
        return b.append_column("__g", pa.array(np.zeros(len(b), np.int64)))

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", "id_a", "id_b"],
                              ascending=[False, True, True]).head(k)
        return pd.DataFrame({
            "id_a": g["id_a"].to_numpy(np.int64),
            "id_b": g["id_b"].to_numpy(np.int64),
            "rn": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    return (parts.map_batches(const, batch_format="pyarrow")
            .groupby("__g").map_groups(merge, batch_format="pandas"))


def grouped_vector_centroids(ds: ray.data.Dataset, *, key_col: str,
                             vec_col: str = "embedding",
                             scale: int = 1_000_000) -> ray.data.Dataset:
    """→ (key, dim: int64 1-based, centroid_units: int64) — per-group
    vector mean in exact fixed point, long-form (one row per key × dim,
    the SQL-checkable shape for a list-column aggregate). Sums are int64
    over quantized components (order-independent), the mean is
    TRUNCATING division (sign × |sum| // n) to match SQL integer ``//``
    semantics on negative sums. Per-batch combiner: one (key,
    d×8-byte sum blob, count) row per key per block — the same exact
    integer-reduce shape as kmeans_fit."""
    def partial(b: pa.Table) -> pa.Table:
        col = b[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # the repo's proven oracle-parity quantizer: Arrow round
        # half_towards_infinity over the flattened components (np.round
        # is half-even; float tricks drift on .5-boundary doubles)
        import pyarrow.compute as pc
        flat = pc.cast(pc.round(
            pc.multiply(pc.cast(pc.list_flatten(col), pa.float64()),
                        pa.scalar(float(scale))),
            round_mode="half_towards_infinity"), pa.int64())
        dim = len(col[0]) if len(col) else 0
        V = flat.to_numpy(zero_copy_only=False).reshape(len(col), dim)
        keys = np.asarray(b[key_col].to_pylist())
        out_k, out_s, out_n = [], [], []
        for k in np.unique(keys):
            rows = V[keys == k]
            out_k.append(k)
            out_s.append(rows.sum(axis=0, dtype=np.int64).tobytes())
            out_n.append(len(rows))
        return pa.table({key_col: pa.array(out_k),
                         "s": pa.array(out_s, pa.binary()),
                         "n": pa.array(out_n, pa.int64())})

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        s = np.sum([np.frombuffer(x, np.int64) for x in group["s"]],
                   axis=0, dtype=np.int64)
        n = int(group["n"].sum())
        cu = np.sign(s) * (np.abs(s) // n)  # SQL trunc-division parity
        return pd.DataFrame({
            key_col: np.repeat(group[key_col].iloc[0], len(s)),
            "dim": np.arange(1, len(s) + 1, dtype=np.int64),
            "centroid_units": cu.astype(np.int64),
        })

    return (ds.select_columns([key_col, vec_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(key_col).map_groups(merge, batch_format="pandas"))
