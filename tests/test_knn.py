"""Similarity search: brute-force top-k correctness vs a numpy oracle,
IVF recall, determinism."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from entity_linking_ray.stages.knn import brute_force_knn, ivf_knn


@pytest.fixture(scope="module")
def vec_ds():
    rng = np.random.default_rng(9)
    V = rng.normal(size=(300, 16))
    rows = [{"vec_id": i, "embedding": list(map(float, V[i]))} for i in range(300)]
    return ray.data.from_arrow(pa.Table.from_pylist(rows)), V


def _oracle_topk(V, qids, k):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn[qids] @ Vn.T
    out = {}
    for qi, q in enumerate(qids):
        scores = C[qi].copy()
        order = np.lexsort((np.arange(len(V)), -scores))
        order = [j for j in order if j != q][:k]
        out[q] = order
    return out


def test_brute_force_matches_oracle(vec_ds):
    ds, V = vec_ds
    qids = [0, 5, 17]
    res = brute_force_knn(ds, V[qids], qids, k=5).to_pandas()
    oracle = _oracle_topk(V, qids, 5)
    for q in qids:
        got = res[res["query_id"] == q].sort_values("rank")["neighbor_id"].tolist()
        assert got == oracle[q], (q, got, oracle[q])


def test_ivf_recall_reasonable(vec_ds):
    ds, V = vec_ds
    qids = list(range(10))
    exact = _oracle_topk(V, qids, 5)
    approx = ivf_knn(ds, V[qids], qids, k=5, n_centroids=8, nprobe=4).to_pandas()
    hits = total = 0
    for q in qids:
        got = set(approx[approx["query_id"] == q]["neighbor_id"].tolist())
        hits += len(got & set(exact[q]))
        total += 5
    assert hits / total >= 0.6  # nprobe=4 of 8 buckets → recall well above half


def test_cosine_self_join_matches_bruteforce():
    """Triangle tile join == exact all-pairs, every pair exactly once —
    int and string id columns, several tile widths."""
    import numpy as np
    import pandas as pd

    from entity_linking_ray.stages.knn import cosine_self_join

    rng = np.random.default_rng(3)
    V = rng.normal(size=(80, 12))
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn @ Vn.T
    iu, ju = np.triu_indices(len(V), k=1)
    thr = np.quantile(C[iu, ju], 0.95)  # enough qualifying pairs
    exact = {(int(i), int(j)) for i, j in
             zip(iu[C[iu, ju] >= thr], ju[C[iu, ju] >= thr])}
    assert len(exact) >= 50

    base = pa.table({
        "vec_id": pa.array(range(len(V)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float64())),
    })
    for tiles in (1, 3, 8):
        got = cosine_self_join(ray.data.from_arrow(base), threshold=float(thr),
                               num_tiles=tiles).to_pandas()
        gp = list(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
        assert len(gp) == len(set(gp)) == len(exact)  # no dup pairs
        assert set(gp) == exact

    sid = pa.table({
        "vec_id": pa.array([f"v{i:03d}" for i in range(len(V))], pa.string()),
        "embedding": base["embedding"],
    })
    got = cosine_self_join(ray.data.from_arrow(sid), threshold=float(thr),
                           num_tiles=4).to_pandas()
    exp_s = {(f"v{a:03d}", f"v{b:03d}") for a, b in exact}
    assert {(a, b) for a, b in zip(got["id_a"], got["id_b"])} == exp_s


def test_cosine_self_join_descending_ids_keep_contract():
    """Regression (round-5 ADVICE): rows arriving id-DESCENDING must still
    honor the id_a < id_b output contract in the diagonal tile branch, and
    top_cosine_pairs must keep every pair (threshold-free path uses -inf,
    so float rounding below -1.0 can't drop anti-parallel pairs)."""
    import numpy as np

    from entity_linking_ray.stages.knn import cosine_self_join, top_cosine_pairs

    rng = np.random.default_rng(11)
    n = 60
    V = rng.normal(size=(n, 8))
    # include an exactly anti-parallel pair (cosine == -1.0)
    V[1] = -V[0]
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn @ Vn.T
    iu, ju = np.triu_indices(n, k=1)

    desc = pa.table({
        "vec_id": pa.array(np.arange(n - 1, -1, -1), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V[::-1]],
                              pa.list_(pa.float64())),
    })  # row order is id-descending: ids[iu] > ids[ju] inside groups

    got = cosine_self_join(ray.data.from_arrow(desc), threshold=-np.inf,
                           num_tiles=3).to_pandas()
    assert (got["id_a"] < got["id_b"]).all()
    assert len(got) == len(iu)  # every unordered pair exactly once
    want = {(int(min(i, j)), int(max(i, j))): C[i, j]
            for i, j in zip(iu, ju)}
    for a, b, c in zip(got["id_a"], got["id_b"], got["cosine"]):
        assert abs(want[(int(a), int(b))] - c) < 1e-9

    # global top-k over the descending layout: compare against brute force
    k = 10
    order = sorted(((C[i, j], int(i), int(j)) for i, j in zip(iu, ju)),
                   key=lambda t: (-t[0], t[1], t[2]))[:k]
    top = top_cosine_pairs(ray.data.from_arrow(desc), k=k,
                           num_tiles=3).to_pandas().sort_values("rn")
    assert [(int(a), int(b)) for a, b in zip(top["id_a"], top["id_b"])] \
        == [(i, j) for _, i, j in order]


def test_kmeans_fit_deterministic_and_improves(ray_session):
    """Lloyd k-means with the exact int64 fixed-point reduce: identical
    centroids across different partitionings, and mean max-cosine
    (cohesion) strictly improves over the hash-sampled init."""
    from entity_linking_ray.stages.knn import (_normalize, kmeans_fit,
                                               sample_centroids)

    rng = np.random.default_rng(3)
    # 4 well-separated direction clusters + noise
    base = _normalize(rng.normal(0, 1, (4, 32)))
    V = _normalize(np.repeat(base, 150, axis=0)
                   + rng.normal(0, 0.15, (600, 32)))
    t = pa.table({"vec_id": pa.array(np.arange(600), pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in V],
                                        pa.list_(pa.float32()))})
    ds2 = ray.data.from_arrow(t).repartition(2).materialize()
    ds7 = ray.data.from_arrow(t).repartition(7).materialize()

    c2 = kmeans_fit(ds2, k=4, iters=4)
    c7 = kmeans_fit(ds7, k=4, iters=4)
    assert np.array_equal(c2, c7)  # bit-identical across partitionings

    def cohesion(C):
        Cn = _normalize(C)
        return float(np.mean(np.max(V @ Cn.T, axis=1)))

    init = sample_centroids(ds2, 4)
    assert cohesion(c2) > cohesion(init) + 0.01


def test_kmeans_actors_bitwise_equals_dataset_path(ray_session):
    """Resident-shard Lloyd (kmeans_fit_actors) trains BIT-IDENTICAL
    centroids to the Dataset-pass kmeans_fit — same init, same exact
    int64 reduce, any shard split."""
    from entity_linking_ray.stages.knn import (_normalize, kmeans_fit,
                                               kmeans_fit_actors)

    rng = np.random.default_rng(9)
    base = _normalize(rng.normal(0, 1, (3, 16)))
    V = _normalize(np.repeat(base, 80, axis=0)
                   + rng.normal(0, 0.2, (240, 16)))
    t = pa.table({"vec_id": pa.array(np.arange(240), pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in V],
                                        pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t).repartition(5).materialize()
    a = kmeans_fit(ds, k=4, iters=3)
    for shards in (1, 3):
        b = kmeans_fit_actors(ds, k=4, iters=3, num_shards=shards)
        assert np.array_equal(a, b)
