"""Label-propagation connected components vs a driver-side union-find
oracle (SURVEY.md §7 hard-part 2), including chains and salted anchors."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from entity_linking_ray.stages.clustering import connected_components, union_find_reference


def _run_cc(pairs, small_graph_edges=0):
    # small_graph_edges=0 forces the DISTRIBUTED label-propagation path
    t = pa.table(
        {"src": pa.array([a for a, _ in pairs], pa.int64()),
         "dst": pa.array([b for _, b in pairs], pa.int64())}
    )
    ds = ray.data.from_arrow(t)
    out = connected_components(ds, num_partitions=4, small_graph_edges=small_graph_edges)
    return {r["node"]: r["label"] for r in out.take_all()}


def _partition_equal(labels, oracle):
    assert set(labels) == set(oracle)
    by_label, by_oracle = {}, {}
    for n in labels:
        by_label.setdefault(labels[n], set()).add(n)
        by_oracle.setdefault(oracle[n], set()).add(n)
    assert sorted(map(sorted, by_label.values())) == sorted(map(sorted, by_oracle.values()))


def test_chain():
    # chain exercises multi-round convergence + pointer jumping
    pairs = [(i, i + 1) for i in range(1, 13)]
    _partition_equal(_run_cc(pairs), union_find_reference(pairs))


def test_stars_and_islands():
    pairs = [(100, i) for i in range(1, 20)] + [(200, 201), (300, 301), (301, 302)]
    _partition_equal(_run_cc(pairs), union_find_reference(pairs))


def test_random_graph_matches_union_find():
    rng = np.random.default_rng(7)
    pairs = [tuple(map(int, rng.integers(0, 200, 2))) for _ in range(300)]
    pairs = [(a, b) for a, b in pairs if a != b]
    _partition_equal(_run_cc(pairs), union_find_reference(pairs))


def test_small_graph_path_matches_distributed():
    rng = np.random.default_rng(11)
    pairs = [tuple(map(int, rng.integers(0, 150, 2))) for _ in range(200)]
    pairs = [(a, b) for a, b in pairs if a != b]
    dist = _run_cc(pairs, small_graph_edges=0)
    small = _run_cc(pairs, small_graph_edges=10**9)
    assert dist == small  # identical labels, not just same partition


def test_empty_edges():
    t = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    out = connected_components(ray.data.from_arrow(t))
    assert out.count() == 0


def test_hot_entity_salting_preserves_components(corpus):
    """Salted sub-anchors (hot_cap tiny → heavy salting) must produce the
    same mention partition as no salting."""
    from entity_linking_ray.pipelines.link_and_cluster import (
        attach_clusters, build_edges, run_pipeline,
    )

    docs = ray.data.from_arrow(corpus["documents"])
    out_salted = run_pipeline(docs, corpus["entities"], hot_cap=10, concurrency=2, num_partitions=4)
    out_plain = run_pipeline(docs, corpus["entities"], hot_cap=10**9, concurrency=2, num_partitions=4)
    a = out_salted["clusters"].to_pandas()
    b = out_plain["clusters"].to_pandas()
    key = ["doc_id", "span_idx", "offset"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert (a[key] == b[key]).all().all()
    # same partition: group sizes per joined cluster pair must biject
    import pandas as pd

    m = pd.DataFrame({"ca": a["cluster_id"], "cb": b["cluster_id"]})
    assert (m.groupby("ca")["cb"].nunique() == 1).all()
    assert (m.groupby("cb")["ca"].nunique() == 1).all()


def test_leaf_folding_matches_general_cc(corpus):
    """cluster_links (degree-1 elimination) must produce IDENTICAL cluster
    labels to the general edge-list label-propagation path — including on
    hot-salted anchors."""
    from entity_linking_ray.pipelines.link_and_cluster import run_pipeline

    docs = ray.data.from_arrow(corpus["documents"])
    fast = run_pipeline(docs, corpus["entities"], hot_cap=10, concurrency=2,
                        num_partitions=4, use_general_cc=False)
    gen = run_pipeline(docs, corpus["entities"], hot_cap=10, concurrency=2,
                       num_partitions=4, use_general_cc=True)
    key = ["doc_id", "span_idx", "offset"]
    a = fast["clusters"].to_pandas().sort_values(key).reset_index(drop=True)
    b = gen["clusters"].to_pandas().sort_values(key).reset_index(drop=True)
    assert (a[key] == b[key]).all().all()
    assert (a["cluster_id"] == b["cluster_id"]).all()


def test_b_cubed_hand_computed():
    """B3 on the textbook fixture: gold {a1,a2,a3}{b1,b2}; prediction
    merges b1 into the a-cluster and splits a3 off."""
    import pandas as pd

    from entity_linking_ray.pipelines.eval import b_cubed

    gold = pd.DataFrame({
        "doc_id": ["d"] * 5, "span_idx": [0] * 5,
        "offset": [1, 2, 3, 4, 5],
        "mention": ["m"] * 5,
        "entity_id": ["A", "A", "A", "B", "B"],
    })
    pred = pd.DataFrame({
        "doc_id": ["d"] * 5, "span_idx": [0] * 5,
        "offset": [1, 2, 3, 4, 5],
        "cluster_id": ["c1", "c1", "c2", "c1", "c3"],
    })
    out = b_cubed(pred, gold)
    # precision per element: c1={a,a,b}: a:2/3,a:2/3,b:1/3; c2=1; c3=1
    assert abs(out["precision"] - (2/3 + 2/3 + 1/3 + 1 + 1) / 5) < 1e-12
    # recall per element: A: 2/3,2/3,1/3 ; B: 1/2,1/2
    assert abs(out["recall"] - (2/3 + 2/3 + 1/3 + 1/2 + 1/2) / 5) < 1e-12

    # perfect prediction -> all ones
    perfect = pred.copy()
    perfect["cluster_id"] = ["x", "x", "x", "y", "y"]
    p = b_cubed(perfect, gold)
    assert p["precision"] == p["recall"] == p["f1"] == 1.0

    # NIL mentions: each its own gold class; merging two NILs costs
    # precision but not recall
    gold2 = gold.copy(); gold2.loc[3:, "entity_id"] = "NIL"
    pred2 = pred.copy(); pred2["cluster_id"] = ["x", "x", "x", "z", "z"]
    out2 = b_cubed(pred2, gold2)
    assert out2["recall"] == 1.0 and out2["precision"] < 1.0


def test_b_cubed_unmatched_same_offset_distinct_spans():
    """Regression (round-5 ADVICE): two UNMATCHED gold mentions sharing
    (doc_id, offset) but differing in span_idx must fall back to two
    distinct singleton clusters, not be merged by the fill id."""
    import pandas as pd

    from entity_linking_ray.pipelines.eval import b_cubed

    gold = pd.DataFrame({
        "doc_id": ["d", "d"], "span_idx": [0, 1], "offset": [7, 7],
        "mention": ["m", "m"], "entity_id": ["A", "A"],
    })
    pred = pd.DataFrame({  # no prediction covers either mention
        "doc_id": [], "span_idx": [], "offset": [], "cluster_id": [],
    })
    out = b_cubed(pred, gold)
    # singletons: precision 1.0; recall per element 1/2 (gold class size 2)
    assert out["precision"] == 1.0
    assert abs(out["recall"] - 0.5) < 1e-12
