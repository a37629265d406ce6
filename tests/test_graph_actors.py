"""Resident edge-shard actors ≡ the Dataset-shuffle graph operators.

The engine (stages/graph_actors.py) pins edges in long-lived actors and
ships only per-iteration deltas; these tests pin BIT-EQUALITY against
the shuffle implementations (stages/graph.py pagerank/bfs_hops,
stages/clustering.py semantics via the union-find oracle) on a random
pre-doubled graph across shard widths.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data


def _random_edges(n_nodes=300, n_edges=1200, seed=7):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    # pre-doubled (both directions), with deliberate duplicates
    src = np.concatenate([a, b, a[:50]])
    dst = np.concatenate([b, a, b[:50]])
    return pa.table({"src": pa.array(src), "dst": pa.array(dst)})


@pytest.fixture(scope="module")
def edge_table():
    return _random_edges()


def test_engine_pagerank_bitwise_equals_shuffle(ray_session, edge_table):
    from entity_linking_ray.stages.graph import pagerank
    from entity_linking_ray.stages.graph_actors import GraphEngine

    want = (pagerank(ray.data.from_arrow(edge_table), iters=5,
                     num_buckets=8)
            .to_pandas().sort_values("node").reset_index(drop=True))
    for shards in (1, 4):
        with GraphEngine(ray.data.from_arrow(edge_table).repartition(3),
                         num_shards=shards) as eng:
            got = (eng.pagerank(iters=5).to_pandas()
                   .sort_values("node").reset_index(drop=True))
        assert (got["node"].to_numpy() == want["node"].to_numpy()).all()
        assert (got["r"].to_numpy() == want["r"].to_numpy()).all()


def test_engine_bfs_equals_shuffle(ray_session, edge_table):
    from entity_linking_ray.stages.graph import bfs_hops
    from entity_linking_ray.stages.graph_actors import GraphEngine

    seeds = [0, 999_999]  # one real node + one absent from the graph
    want = (bfs_hops(ray.data.from_arrow(edge_table), seeds=seeds,
                     max_hops=4, num_buckets=8)
            .to_pandas().sort_values("node").reset_index(drop=True))
    with GraphEngine(ray.data.from_arrow(edge_table).repartition(3),
                     num_shards=4) as eng:
        got = (eng.bfs(seeds=seeds, max_hops=4).to_pandas()
               .sort_values("node").reset_index(drop=True))
    assert (got["node"].to_numpy() == want["node"].to_numpy()).all()
    assert (got["hop"].to_numpy() == want["hop"].to_numpy()).all()


def test_engine_bfs_directed_sinks_equal_shuffle(ray_session):
    """DIRECTED graph with dst-only sink nodes: the shuffle path keeps a
    reached sink in its label table; the actor engine must too (sinks own
    no out-edges, so they live outside the CSR node set)."""
    from entity_linking_ray.stages.graph import bfs_hops
    from entity_linking_ray.stages.graph_actors import GraphEngine

    rng = np.random.default_rng(11)
    # layered DAG: 0..9 → 100..139 → 1000..1019 (last layer all sinks),
    # plus a few sink hubs reached at different levels
    src = np.concatenate([
        rng.integers(0, 10, 60), rng.integers(100, 140, 60),
        np.array([0, 3, 105]),
    ]).astype(np.int64)
    dst = np.concatenate([
        rng.integers(100, 140, 60), rng.integers(1000, 1020, 60),
        np.array([7777, 7777, 8888]),
    ]).astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    seeds = [0, 1, 2, 3]
    want = (bfs_hops(ray.data.from_arrow(t), seeds=seeds, max_hops=4,
                     num_buckets=8)
            .to_pandas().sort_values("node").reset_index(drop=True))
    for shards in (1, 4):
        with GraphEngine(ray.data.from_arrow(t).repartition(3),
                         num_shards=shards) as eng:
            got = (eng.bfs(seeds=seeds, max_hops=4).to_pandas()
                   .sort_values("node").reset_index(drop=True))
        assert (got["node"].to_numpy() == want["node"].to_numpy()).all()
        assert (got["hop"].to_numpy() == want["hop"].to_numpy()).all()


def test_engine_cc_equals_union_find(ray_session):
    from entity_linking_ray.stages.clustering import union_find_reference
    from entity_linking_ray.stages.graph_actors import GraphEngine

    # several components, chain-shaped (stresses pointer jumping), plus
    # a dense clump
    rng = np.random.default_rng(5)
    chains = []
    base = 0
    for ln in (40, 17, 3, 1):
        ids = np.arange(base, base + ln + 1, dtype=np.int64) * 13 + 5
        chains.append(np.stack([ids[:-1], ids[1:]], axis=1))
        base += ln + 10
    clump_ids = np.arange(5000, 5030, dtype=np.int64)
    clump = np.stack([rng.choice(clump_ids, 80),
                      rng.choice(clump_ids, 80)], axis=1)
    clump = clump[clump[:, 0] != clump[:, 1]]
    e = np.concatenate(chains + [clump])
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    ref = union_find_reference([(int(a), int(b)) for a, b in e])
    with GraphEngine(ray.data.from_arrow(t).repartition(3),
                     num_shards=4) as eng:
        got = eng.connected_components().to_pandas()
    got_map = dict(zip(got["node"].astype(int), got["label"].astype(int)))
    assert got_map == ref  # label == component min node, every node


def test_connected_components_actor_plan(ray_session, edge_table):
    """connected_components' large-graph branch routed through the
    resident-shard engine (small_graph_edges=0 forces it) matches the
    driver union-find exactly."""
    from entity_linking_ray.stages.clustering import (
        connected_components, union_find_reference)

    ds = ray.data.from_arrow(edge_table)
    got = connected_components(ds, small_graph_edges=0,
                               large_graph_plan="actors").to_pandas()
    pairs = list(zip(edge_table["src"].to_pylist(),
                     edge_table["dst"].to_pylist()))
    ref = union_find_reference(pairs)
    got_map = dict(zip(got["node"].astype(int), got["label"].astype(int)))
    assert got_map == ref


def test_engine_empty_and_single_edge(ray_session):
    from entity_linking_ray.stages.graph_actors import GraphEngine

    t = pa.table({"src": pa.array([1, 2], pa.int64()),
                  "dst": pa.array([2, 1], pa.int64())})
    with GraphEngine(ray.data.from_arrow(t), num_shards=4) as eng:
        pr = eng.pagerank(iters=2).to_pandas()
        assert set(pr["node"]) == {1, 2}
        cc = eng.connected_components().to_pandas()
        assert set(zip(cc["node"], cc["label"])) == {(1, 1), (2, 1)}
        hops = eng.bfs(seeds=[1], max_hops=3).to_pandas()
        assert dict(zip(hops["node"], hops["hop"])) == {1: 0, 2: 1}


def _kcore_reference(src, dst, k):
    """Single-process synchronous peeling over a pre-doubled, deduped
    edge list: the textbook definition the engine must reproduce."""
    e = np.unique(np.stack([np.asarray(src, np.int64),
                            np.asarray(dst, np.int64)], 1), axis=0)
    s, d = e[:, 0], e[:, 1]
    surv = set(np.unique(s).tolist())
    while True:
        m = np.array([(a in surv) and (b in surv)
                      for a, b in zip(s.tolist(), d.tolist())], bool) \
            if len(s) else np.zeros(0, bool)
        u, c = np.unique(s[m], return_counts=True)
        new = set(u[c >= k].tolist())
        if new == surv:
            return {int(n): int(cnt) for n, cnt in zip(u, c) if n in surv}
        surv = new


@pytest.mark.parametrize("k", [2, 4, 7])
def test_engine_kcore_equals_reference(ray_session, edge_table, k):
    from entity_linking_ray.stages.graph_actors import GraphEngine

    ref = _kcore_reference(edge_table["src"].to_numpy(),
                           edge_table["dst"].to_numpy(), k)
    for shards in (1, 4):
        with GraphEngine(ray.data.from_arrow(edge_table).repartition(3),
                         num_shards=shards) as eng:
            out = eng.kcore(k=k)
            assert [f.name for f in out.schema().base_schema] == \
                ["node", "core_deg"]  # typed even when the core is empty
            got = out.to_pandas()
        if len(got) == 0:  # Ray to_pandas drops columns on 0 rows
            assert ref == {}
            continue
        got_map = dict(zip(got["node"].astype(int),
                           got["core_deg"].astype(int)))
        assert got_map == ref


def test_engine_kcore_empty_core_and_waves(ray_session):
    """k above the max degree empties the core in one wave; the wave
    counter feeds the SQL-unroll pin for the battery oracle."""
    from entity_linking_ray.stages.graph_actors import GraphEngine

    t = pa.table({"src": pa.array([1, 2, 2, 3], pa.int64()),
                  "dst": pa.array([2, 1, 3, 2], pa.int64())})
    with GraphEngine(ray.data.from_arrow(t), num_shards=2) as eng:
        out = eng.kcore(k=5).to_pandas()
        assert len(out) == 0
        assert eng.last_kcore_rounds <= 2
        # chain graph: 1-2-3 has no 2-core (endpoints peel, then middle)
        out2 = eng.kcore(k=2).to_pandas()
        assert len(out2) == 0
        assert eng.last_kcore_rounds == 2


def test_kcore_battery_waves_within_sql_unroll(ray_session):
    """The part_copurchase_kcore oracle unrolls 16 peeling rounds; the
    engine must converge within that on the correctness-scale input."""
    import os

    from entity_linking_ray.queries import _read
    from entity_linking_ray.stages.graph_actors import GraphEngine

    sf_dir = os.environ.get("GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def both(b):
        import pyarrow.compute as pc
        ok = pc.multiply(pc.cast(b["l_orderkey"], pa.int64()), 2)
        pk = pc.add(pc.multiply(pc.cast(b["l_partkey"], pa.int64()), 2), 1)
        ok = ok.combine_chunks() if isinstance(ok, pa.ChunkedArray) else ok
        pk = pk.combine_chunks() if isinstance(pk, pa.ChunkedArray) else pk
        return pa.table({"src": pa.concat_arrays([ok, pk]),
                         "dst": pa.concat_arrays([pk, ok])})

    edges = li.map_batches(both, batch_format="pyarrow")
    with GraphEngine(edges, num_shards=4) as eng:
        out = eng.kcore(k=6).to_pandas()
        assert eng.last_kcore_rounds <= 16
    assert len(out) > 0
    assert int(out["core_deg"].min()) >= 6


def test_engine_weighted_pagerank_reference_and_unit_weights(ray_session):
    from entity_linking_ray.stages.graph_actors import UNITS, GraphEngine

    # small weighted digraph (pre-doubled where undirected not required:
    # pagerank runs on the directed edge set as given)
    src = np.array([1, 1, 2, 3, 3, 3], np.int64)
    dst = np.array([2, 3, 1, 1, 2, 2], np.int64)  # (3,2) duplicated
    w = np.array([5, 1, 7, 2, 3, 4], np.int64)    # dup weights sum → 7
    t = pa.table({"src": src, "dst": dst, "w": w})
    with GraphEngine(ray.data.from_arrow(t).repartition(2), num_shards=2,
                     weight_col="w") as eng:
        got = eng.pagerank(iters=4, weighted=True).to_pandas()
    got_map = dict(zip(got["node"].astype(int), got["r"].astype(int)))

    # python reference of the exact fixed-point scheme
    edges = {(1, 2): 5, (1, 3): 1, (2, 1): 7, (3, 1): 2, (3, 2): 7}
    nodes = sorted({a for a, _ in edges})
    wdeg = {u: sum(wt for (a, _), wt in edges.items() if a == u)
            for u in nodes}
    n = len(nodes)
    r = {u: UNITS // n for u in nodes}
    base = (15 * UNITS) // (100 * n)
    for _ in range(4):
        acc = {u: 0 for u in nodes}
        for (a, b), wt in edges.items():
            acc[b] += wt * ((85 * r[a]) // (100 * wdeg[a]))
        r = {u: base + acc[u] for u in nodes}
    assert got_map == r

    # all-ones weights on a duplicate-free graph ≡ the unweighted path
    t1 = pa.table({"src": src[:5], "dst": dst[:5],
                   "w": pa.array(np.ones(5, np.int64))})
    with GraphEngine(ray.data.from_arrow(t1), num_shards=2,
                     weight_col="w") as eng:
        a = eng.pagerank(iters=3, weighted=True).to_pandas()
        b = eng.pagerank(iters=3, weighted=False).to_pandas()
    am = dict(zip(a["node"].astype(int), a["r"].astype(int)))
    bm = dict(zip(b["node"].astype(int), b["r"].astype(int)))
    assert am == bm
