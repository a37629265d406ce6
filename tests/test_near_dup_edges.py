"""Near-dup mention-edge channel: LSH pairs become edges, general CC merges
the transitive chain (FIXTURES.md edge-case 9: A–B via entity, B–C via
near-dup)."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from entity_linking_ray.pipelines.link_and_cluster import near_dup_mention_edges


def _scored(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "span_idx": pa.array([0] * len(rows), pa.int32()),
        "offset": pa.array([r[1] for r in rows], pa.int32()),
        "norm_mention": pa.array([r[2] for r in rows], pa.string()),
        "context_left": pa.array([r[3] for r in rows], pa.string()),
        "context_right": pa.array([r[4] for r in rows], pa.string()),
    }))


def test_near_dup_pairs_same_surface_similar_context():
    ctx = "solar panel quarterly report energy output"
    rows = [
        ("d1", 10, "acme corp", ctx, "installation megawatt"),
        ("d2", 20, "acme corp", ctx, "installation megawatt today"),  # near-dup of d1
        ("d3", 30, "acme corp", "totally different words about cooking", "pasta recipe"),
        ("d4", 40, "zenith ltd", ctx, "installation megawatt"),  # diff surface
    ]
    edges = near_dup_mention_edges(_scored(rows), cosine_threshold=0.7).to_pandas()
    from entity_linking_ray.stages.pairwise import mention_node_hashes

    tbl = _scored(rows).to_pandas()
    # recompute node hashes for identification
    nodes = {}
    batch = pa.table({
        "doc_id": pa.array(tbl["doc_id"], pa.string()),
        "span_idx": pa.array(tbl["span_idx"], pa.int32()),
        "offset": pa.array(tbl["offset"], pa.int32()),
    })
    h = mention_node_hashes(batch)
    for d, n in zip(tbl["doc_id"], h):
        nodes[d] = int(n)

    got = {tuple(sorted(p)) for p in zip(edges["src"], edges["dst"])}
    assert tuple(sorted((nodes["d1"], nodes["d2"]))) in got
    # different context (d3) and different surface (d4) never pair with d1
    assert not any(nodes["d3"] in p for p in got)
    assert not any(nodes["d4"] in p and nodes["d1"] in p for p in got)


def test_chain_via_entity_and_near_dup(corpus):
    """A links to entity E; B (same surface, near-identical context) scores
    NIL; the near-dup edge must pull B into A's cluster under the general
    CC path — and the synthetic gold corpus must stay at F1≥0.99 with the
    channel ON (its NIL mentions have filler contexts that fail the cosine
    verify)."""
    from entity_linking_ray.pipelines import eval as ev
    from entity_linking_ray.pipelines.link_and_cluster import run_pipeline

    docs = ray.data.from_arrow(corpus["documents"])
    out = run_pipeline(docs, corpus["entities"], hot_cap=100, concurrency=2,
                       num_partitions=4, near_dup_edges=True)
    clusters = out["clusters"].to_pandas()
    f1 = ev.pairwise_f1(clusters, corpus["mentions_gold"].to_pandas())
    assert f1["f1"] >= 0.99, f1


def test_near_dup_edges_join_mode_matches_broadcast():
    """The distributed join-back verify (100-TB path) must produce exactly
    the broadcast verify's edge set."""
    ctx = "solar panel quarterly report energy output"
    rows = [("d%d" % i, 10 * i, "acme corp", ctx, "installation megawatt")
            for i in range(6)]
    rows += [("x1", 5, "zenith ltd", "cooking pasta recipe", "tomato basil"),
             ("x2", 15, "zenith ltd", "cooking pasta recipe", "tomato basil")]
    scored = _scored(rows)
    b = near_dup_mention_edges(scored, cosine_threshold=0.7,
                               pair_mode="broadcast").to_pandas()
    j = near_dup_mention_edges(scored, cosine_threshold=0.7,
                               pair_mode="join", num_partitions=4).to_pandas()
    eb = {tuple(sorted(p)) for p in zip(b["src"], b["dst"])}
    ej = {tuple(sorted(p)) for p in zip(j["src"], j["dst"])}
    assert eb == ej
    assert len(eb) >= 15 + 1  # the 6-clique plus the zenith pair


def test_sn_edges_typo_variant_with_context_guard():
    """Third blocking family: a surface typo-variant adjacent in byte
    order merges only when BOTH the JW surface guard and the exact
    context cosine pass."""
    from entity_linking_ray.pipelines.link_and_cluster import sn_mention_edges
    from entity_linking_ray.stages.pairwise import mention_node_hashes

    ctx = "solar panel quarterly report energy output"
    rows = [
        ("d1", 10, "acme corp", ctx, "installation megawatt"),
        ("d2", 20, "acme corpx", ctx, "installation megawatt today"),
        ("d3", 30, "acme corpy", "totally different words about cooking",
         "pasta recipe"),  # adjacent surface, failing context
        ("d4", 40, "zzz widget", ctx, "installation megawatt"),  # far surface
    ]
    ds = _scored(rows)
    edges = sn_mention_edges(ds, window=3,
                             cosine_threshold=0.7).to_pandas()
    t = _scored(rows).to_pandas()
    batch = pa.table({
        "doc_id": pa.array(t["doc_id"], pa.string()),
        "span_idx": pa.array(t["span_idx"], pa.int32()),
        "offset": pa.array(t["offset"], pa.int32()),
    })
    nodes = dict(zip(t["doc_id"], (int(h) for h in mention_node_hashes(batch))))
    got = {tuple(sorted(p)) for p in zip(edges["src"], edges["dst"])}
    assert tuple(sorted((nodes["d1"], nodes["d2"]))) in got
    assert not any(nodes["d3"] in p for p in got)
    assert not any(nodes["d4"] in p for p in got)


def test_pipeline_f1_holds_with_sn_channel(corpus):
    """F1 gate must hold with the sorted-neighborhood channel ON."""
    from entity_linking_ray.pipelines import eval as ev
    from entity_linking_ray.pipelines.link_and_cluster import run_pipeline

    docs = ray.data.from_arrow(corpus["documents"])
    out = run_pipeline(docs, corpus["entities"], hot_cap=100, concurrency=2,
                       num_partitions=4, sn_edges=True)
    clusters = out["clusters"].to_pandas()
    f1 = ev.pairwise_f1(clusters, corpus["mentions_gold"].to_pandas())
    assert f1["f1"] >= 0.99, f1


def test_surface_order_keys_match_scalar_definition():
    """Property (round-5 VERDICT #3): the vectorized buffer-scatter order
    key equals the scalar int.from_bytes definition on arbitrary
    unicode surfaces — empty, short, long, CJK, chunked arrays."""
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from entity_linking_ray.stages.blocking import surface_order_keys

    def scalar(s: str) -> int:
        return int.from_bytes(
            s.encode("utf-8")[:8].ljust(8, b"\0"), "big") >> 1

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.text(max_size=16), max_size=40),
           st.integers(min_value=1, max_value=4))
    def check(surfs, n_chunks):
        arrs = [pa.array(surfs[i::n_chunks], pa.string())
                for i in range(n_chunks)]
        col = pa.chunked_array(arrs)
        want = np.array([scalar(s) for chunk in arrs
                         for s in chunk.to_pylist()], np.int64) \
            if len(col) else np.empty(0, np.int64)
        got = surface_order_keys(col)
        assert (got == want).all()

    check()
    # sliced array (non-zero Arrow offset)
    a = pa.array(["alpha", "betabetabeta", "", "七転び八起き"], pa.string())
    sl = a.slice(1, 3)
    assert (surface_order_keys(sl)
            == np.array([scalar(s) for s in sl.to_pylist()])).all()
