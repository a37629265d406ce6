"""Flagship lexical candidate channel (reference Solr/BM25 path)."""

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _mention_batch(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "span_idx": pa.array([0] * len(rows), pa.int64()),
        "offset": pa.array([0] * len(rows), pa.int64()),
        "mention": pa.array([r[1] for r in rows], pa.string()),
        "norm_mention": pa.array([r[1] for r in rows], pa.string()),
        "context_left": pa.array([r[2] for r in rows], pa.string()),
        "context_right": pa.array([r[3] for r in rows], pa.string()),
    })


def _entities():
    return pa.table({
        "entity_id": pa.array(["E1", "E2"], pa.string()),
        "subject": pa.array(["Zorblatt Inc", "Quuxon Ltd"], pa.string()),
        "aliases": pa.array([["zorblatt"], ["quuxon"]],
                            pa.list_(pa.string())),
        "types": pa.array([["Thing"], ["Thing"]], pa.list_(pa.string())),
        "infobox": pa.array(
            [[{"predicate": "profile",
               "object": "grimvale harbor shipping fleet"}],
             [{"predicate": "profile",
               "object": "meadowbrook orchard cider press"}]],
            pa.list_(pa.struct([("predicate", pa.string()),
                                ("object", pa.string())]))),
    })


def test_lexical_channel_recovers_non_alias_mentions(ray_session):
    """A mention whose surface matches NO alias gets its gold entity only
    through the lexical channel (context tokens hit the entity
    description) — recall@k vs the alias-only configuration."""
    from entity_linking_ray.stages.candidates import (CandidateGenerator,
                                                      make_kb_blob)

    kb = make_kb_blob(_entities())
    batch = _mention_batch([
        # surface "the company" is no alias; context is E1's description
        ("d1", "the company", "grimvale harbor", "shipping fleet docks"),
        ("d2", "the firm", "meadowbrook orchard", "cider press opens"),
    ])
    # alias-only channel: no candidates at all
    g0 = CandidateGenerator(kb, k=5, ann_k=0, lex_k=0)
    out0 = g0(batch)
    assert [len(c) for c in out0["cands"].to_pylist()] == [0, 0]

    # lexical channel on: gold entity rank-1, source tagged "lexical"
    g1 = CandidateGenerator(kb, k=5, ann_k=0, lex_k=5)
    out1 = g1(batch)
    cands = out1["cands"].to_pylist()
    assert cands[0][0]["entity_id"] == "E1"
    assert cands[0][0]["source"] == "lexical"
    assert cands[1][0]["entity_id"] == "E2"
    assert cands[0][0]["retrieval_score"] > 0


def test_lexical_fill_respects_precedence_and_room(ray_session):
    """Exact candidates keep their slots; lexical fills only the rest and
    never duplicates an entity already present."""
    from entity_linking_ray.stages.candidates import (CandidateGenerator,
                                                      make_kb_blob)

    kb = make_kb_blob(_entities())
    batch = _mention_batch([
        # surface IS an alias of E1; context ALSO matches E1 and E2
        ("d1", "zorblatt", "grimvale harbor", "meadowbrook orchard"),
    ])
    g = CandidateGenerator(kb, k=2, ann_k=0, lex_k=5)
    c = g(batch)["cands"].to_pylist()[0]
    assert [x["source"] for x in c] == ["exact", "lexical"]
    assert c[0]["entity_id"] == "E1"
    assert c[1]["entity_id"] == "E2"  # E1 not duplicated by the filler
    # k=1 leaves no room: lexical adds nothing
    g1 = CandidateGenerator(kb, k=1, ann_k=0, lex_k=5)
    c1 = g1(batch)["cands"].to_pylist()[0]
    assert [x["source"] for x in c1] == ["exact"]


def test_flagship_f1_gate_with_lexical_channel(ray_session, corpus):
    """lexical_channel=True keeps pairwise F1 and B³ at 1.0 on the
    synthetic gold corpus (the channel only ADDS candidates; scoring
    precedence keeps the gold links on top)."""
    from entity_linking_ray.pipelines import eval as ev
    from entity_linking_ray.pipelines.link_and_cluster import run_pipeline

    docs = ray.data.from_arrow(corpus["documents"])
    out = run_pipeline(docs, corpus["entities"], hot_cap=100,
                       concurrency=2, lexical_channel=True)
    clusters = out["clusters"].to_pandas()
    gold = corpus["mentions_gold"].to_pandas()
    f1 = ev.pairwise_f1(clusters, gold)
    assert f1["f1"] == 1.0
    b3 = ev.b_cubed(clusters, gold)
    assert b3["f1"] == 1.0


def test_flagship_all_channels_f1(ray_session, corpus):
    """Every optional channel ON simultaneously (LSH near-dup + SN +
    lexical + OOV): the F1 and B³ gates still hold — channels only add
    candidates/edges under their precision guards."""
    from entity_linking_ray.pipelines import eval as ev
    from entity_linking_ray.pipelines.link_and_cluster import run_pipeline

    docs = ray.data.from_arrow(corpus["documents"])
    out = run_pipeline(docs, corpus["entities"], hot_cap=100,
                       concurrency=2, near_dup_edges=True, sn_edges=True,
                       lexical_channel=True, oov_channel=True)
    clusters = out["clusters"].to_pandas()
    gold = corpus["mentions_gold"].to_pandas()
    assert ev.pairwise_f1(clusters, gold)["f1"] == 1.0
    assert ev.b_cubed(clusters, gold)["f1"] == 1.0
