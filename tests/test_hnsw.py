"""HNSW graph ANN: recall vs brute force, drop-in contract, Dataset op."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from entity_linking_ray.stages.hnsw import HNSWBroadcastIndex, HNSWIndex, hnsw_knn


def _unit_rows(n, d, seed):
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(n, d)).astype(np.float32)
    return V / np.linalg.norm(V, axis=1, keepdims=True)


def test_hnsw_recall_vs_exact():
    V = _unit_rows(500, 32, seed=7)
    Q = _unit_rows(20, 32, seed=8)
    index = HNSWIndex(V, m=16, ef_construction=200, ef_search=256)
    k = 10
    hits = total = 0
    for q in Q:
        exact = set(np.argsort(-(V @ q))[:k].tolist())
        approx, _ = index.search_one(q, k)
        hits += len(exact & set(approx.tolist()))
        total += k
    recall = hits / total
    assert recall >= 0.9, f"recall@10 {recall:.3f} below 0.9"


def test_hnsw_broadcast_index_contract(ray_session):
    """Same blob + search() contract as ann.BroadcastIndex (the drop-in)."""
    V = _unit_rows(300, 16, seed=3)
    ids = np.array([f"E{i:04d}" for i in range(len(V))], dtype=object)
    blob_ref = ray.put((ids, V))
    idx = HNSWBroadcastIndex(blob_ref, ef_search=256)
    Q = V[:5] + 0.001  # near-self queries: top-1 must be the row itself
    out_ids, out_scores = idx.search(np.asarray(Q, np.float32), k=3)
    assert out_ids.shape == (5, 3) and out_scores.shape == (5, 3)
    assert [out_ids[i, 0] for i in range(5)] == [f"E{i:04d}" for i in range(5)]
    # scores sorted desc per row
    assert all((np.diff(out_scores[i]) <= 1e-6).all() for i in range(5))


def test_hnsw_knn_dataset(ray_session):
    V = _unit_rows(200, 16, seed=11)
    V[150] = V[0] * 0.999 + 0.001 * V[1]  # planted near-dup of row 0
    V[150] /= np.linalg.norm(V[150])
    tbl = pa.table({
        "vec_id": pa.array(range(len(V)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V], pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = hnsw_knn(ds, V[[0]], [0], k=3, ef_search=256).to_pandas()
    got = out.sort_values("rank")
    assert int(got.iloc[0]["neighbor_id"]) == 150  # the planted near-dup
    assert set(got.columns) >= {"query_id", "neighbor_id", "cosine", "rank"}


def test_hnsw_persistent_shards(ray_session, tmp_path):
    """build_hnsw_shards + ann.sharded_topk: recall vs exact, graph built
    ONCE per shard across repeated query batches, and save/load reproduces
    identical search results (deterministic build)."""
    from entity_linking_ray.stages.ann import sharded_topk, topk_ids
    from entity_linking_ray.stages.hnsw import HNSWShard, build_hnsw_shards

    rng = np.random.default_rng(11)
    V = rng.normal(size=(400, 16)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    ids = np.array([f"e{i:04d}" for i in range(len(V))], dtype=object)
    Q = V[:10] + rng.normal(scale=0.05, size=(10, 16)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)

    shards = build_hnsw_shards(ids, V, num_shards=3)
    got_ids, _ = sharded_topk(shards, Q, k=10)
    exact_ids, _ = topk_ids(Q @ V.T, ids, 10)
    recall = np.mean([len(set(g) & set(e)) / 10
                      for g, e in zip(got_ids, exact_ids)])
    assert recall >= 0.9

    # many query batches — no rebuilds after seal()
    for _ in range(3):
        sharded_topk(shards, Q, k=5)
    assert all(ray.get(s.build_count.remote()) == 1 for s in shards)

    # save → fresh actors → load: identical results
    paths = [str(tmp_path / f"hnsw-{i}.npz") for i in range(3)]
    ray.get([s.save.remote(p) for s, p in zip(shards, paths)])
    fresh = [HNSWShard.remote() for _ in paths]
    ray.get([s.load.remote(p) for s, p in zip(fresh, paths)])
    got2_ids, got2_sc = sharded_topk(fresh, Q, k=10)
    assert [list(map(str, r)) for r in got2_ids] == \
        [list(map(str, r)) for r in got_ids]
