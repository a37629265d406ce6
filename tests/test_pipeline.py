"""End-to-end flagship pipeline: the BASELINE.json gates.

- pairwise F1 ≥ 0.99 at shared blocking keys (golden comparison)
- span-sequence equality on every emitted row (per-row invariant)
- per-mention link accuracy / recall@k
- extraction exactly recovers the planted gold mentions
"""

import pyarrow as pa
import pyarrow.compute as pc

from entity_linking_ray.pipelines import eval as ev


def test_extraction_recovers_gold(corpus, pipeline_output):
    got = {
        (r.doc_id, r.span_idx, r.offset)
        for r in pipeline_output["mentions"].itertuples()
    }
    want = {
        (g["doc_id"], g["span_idx"], g["offset"])
        for g in corpus["mentions_gold"].to_pylist()
    }
    assert got == want


def test_link_accuracy(corpus, pipeline_output):
    acc = ev.link_accuracy(pipeline_output["links"], corpus["mentions_gold"].to_pandas())
    assert acc["accuracy"] >= 0.99, acc


def test_pairwise_f1_gate(corpus, pipeline_output):
    f1 = ev.pairwise_f1(pipeline_output["clusters"], corpus["mentions_gold"].to_pandas())
    assert f1["f1"] >= 0.99, f1


def test_recall_at_k(corpus, pipeline_output):
    r = ev.recall_at_k(pipeline_output["scored_pairs"], corpus["mentions_gold"].to_pandas())
    assert r["recall@1"] >= 0.99
    assert r["recall@10"] >= 0.999


def test_span_sequence_invariant(corpus, pipeline_output):
    """Every emitted annotated-document row carries its spans list
    byte-identically (kind, text, media_ref, order)."""
    out = pipeline_output["annotated_documents"]
    inp = corpus["documents"]
    out_sorted = out.sort_by("doc_id")
    inp_sorted = inp.sort_by("doc_id")
    assert out_sorted.num_rows == inp_sorted.num_rows
    assert out_sorted["doc_id"].to_pylist() == inp_sorted["doc_id"].to_pylist()
    # struct-field-level equality including order within each list
    assert out_sorted["spans"].to_pylist() == inp_sorted["spans"].to_pylist()


def test_scored_pairs_ranked_desc_stable(pipeline_output):
    sp = pipeline_output["scored_pairs"]
    for _, grp in sp.groupby(["doc_id", "span_idx", "offset"]):
        g = grp.sort_values("rank")
        scores = g["score"].tolist()
        assert scores == sorted(scores, reverse=True)
        # stable tie-break: equal scores ordered by entity_id asc
        for i in range(len(g) - 1):
            if scores[i] == scores[i + 1]:
                assert g["entity_id"].iloc[i] < g["entity_id"].iloc[i + 1]


def test_nil_mentions_are_singletons(corpus, pipeline_output):
    gold = corpus["mentions_gold"].to_pandas()
    merged = gold.merge(pipeline_output["clusters"], on=["doc_id", "span_idx", "offset"])
    nil_clusters = merged[merged["entity_id"] == "NIL"]["cluster_id"]
    # each NIL mention is its own cluster (never merged with anything)
    all_counts = pipeline_output["clusters"]["cluster_id"].value_counts()
    assert all(all_counts[c] == 1 for c in nil_clusters)


def test_fused_pipeline_matches_plain(corpus):
    """Operator-fusion configuration must produce identical links/clusters."""
    import ray
    import ray.data

    from entity_linking_ray.pipelines.link_and_cluster import (
        run_pipeline, run_pipeline_fused,
    )

    docs = ray.data.from_arrow(corpus["documents"])
    key = ["doc_id", "span_idx", "offset"]
    a = run_pipeline_fused(docs, corpus["entities"], hot_cap=100, concurrency=2,
                           num_partitions=4)["clusters"].to_pandas()
    b = run_pipeline(docs, corpus["entities"], hot_cap=100, concurrency=2,
                     num_partitions=4)["clusters"].to_pandas()
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_empty_corpus_typed_outputs():
    """Typed-empty contract on the flagship: a zero-row corpus yields all
    six output tables with their documented schemas (map_batches UDFs
    never run on empty inputs, so the types come from the _ensure_typed
    seed blocks)."""
    import ray.data

    from entity_linking_ray import schemas
    from entity_linking_ray.pipelines.link_and_cluster import (
        OUT_SCHEMAS, run_pipeline)
    from entity_linking_ray.testdata import derive_entities

    empty = pa.table({"doc_id": pa.array([], pa.string()),
                      "spans": pa.array([], pa.list_(schemas.SPAN_STRUCT))})
    out = run_pipeline(ray.data.from_arrow(empty), derive_entities(),
                       concurrency=2)
    for name, sch in OUT_SCHEMAS.items():
        ds = out[name]
        assert ds.count() == 0
        assert ds.schema() is not None and ds.schema().names == sch.names, name


def test_ari_gate(corpus, pipeline_output):
    r = ev.adjusted_rand_index(pipeline_output["clusters"],
                               corpus["mentions_gold"].to_pandas())
    assert r["ari"] == 1.0, r
