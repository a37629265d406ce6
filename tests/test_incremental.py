"""Incremental ER ingestion: batch-B increment over an archive equals a
full run over A ∪ B (run_pipeline_incremental)."""

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _canon(df):
    return (df.sort_values(["doc_id", "span_idx", "offset"])
            .reset_index(drop=True))


def test_incremental_equals_full_run(ray_session, corpus):
    from entity_linking_ray.pipelines.link_and_cluster import (
        run_pipeline, run_pipeline_incremental)

    docs_tbl = corpus["documents"]
    n = docs_tbl.num_rows
    a_tbl = docs_tbl.slice(0, n // 2)
    b_tbl = docs_tbl.slice(n // 2)

    # full run over the union (default channel config)
    full = run_pipeline(ray.data.from_arrow(docs_tbl),
                        corpus["entities"], hot_cap=100, concurrency=2)
    want = _canon(full["clusters"].to_pandas())

    # archive run on A, then increment with B
    first = run_pipeline_incremental(
        ray.data.from_arrow(a_tbl), corpus["entities"], hot_cap=100,
        concurrency=2)
    second = run_pipeline_incremental(
        ray.data.from_arrow(b_tbl), corpus["entities"], hot_cap=100,
        concurrency=2,
        prior_state=first["state"],
        prior_clusters=first["clusters"].materialize())
    got = _canon(second["clusters"].to_pandas())

    assert len(got) == len(want)
    for c in ("doc_id", "span_idx", "offset", "cluster_id"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    # the merged state equals the full run's state (monoid merge exact)
    from entity_linking_ray.pipelines.link_and_cluster import (
        entity_cluster_state)
    fs = (entity_cluster_state(full["links"]).to_pandas()
          .sort_values("entity_id").reset_index(drop=True))
    ms = (second["state"].to_pandas()
          .sort_values("entity_id").reset_index(drop=True))
    assert (fs["entity_id"].to_numpy() == ms["entity_id"].to_numpy()).all()
    assert (fs["m_min"].to_numpy() == ms["m_min"].to_numpy()).all()
    assert (fs["n"].to_numpy() == ms["n"].to_numpy()).all()


def test_incremental_relabels_only_changed(ray_session, corpus):
    """A second increment whose mentions do NOT lower any entity's min
    leaves prior cluster ids untouched; one that does rewrites exactly
    the touched entity's rows."""
    from entity_linking_ray.pipelines.link_and_cluster import (
        _changed_label_pairs, entity_cluster_state, run_pipeline_incremental)

    docs_tbl = corpus["documents"]
    n = docs_tbl.num_rows
    first = run_pipeline_incremental(
        ray.data.from_arrow(docs_tbl.slice(0, n // 2)),
        corpus["entities"], hot_cap=100, concurrency=2)
    second_state = entity_cluster_state(
        run_pipeline_incremental(
            ray.data.from_arrow(docs_tbl.slice(n // 2)),
            corpus["entities"], hot_cap=100, concurrency=2)["links"]
    ).materialize()
    changed = _changed_label_pairs(first["state"].materialize(),
                                   second_state, hot_cap=100)
    # every changed pair maps a strictly larger old label to the new min
    if len(changed):
        assert (changed["new_label"].to_numpy()
                < changed["old_label"].to_numpy()).all()


def test_empty_increment_returns_archive_unchanged(ray_session, corpus):
    """An empty increment (no new docs this batch) is a no-op: the merged
    state and the clusters table equal the archive's."""
    from entity_linking_ray import schemas
    from entity_linking_ray.pipelines.link_and_cluster import (
        run_pipeline_incremental)

    docs_tbl = corpus["documents"]
    first = run_pipeline_incremental(ray.data.from_arrow(docs_tbl),
                                     corpus["entities"], concurrency=2)
    prior_clusters = first["clusters"].materialize()
    empty = pa.table({"doc_id": pa.array([], pa.string()),
                      "spans": pa.array([], pa.list_(schemas.SPAN_STRUCT))})
    second = run_pipeline_incremental(
        ray.data.from_arrow(empty), corpus["entities"], concurrency=2,
        prior_state=first["state"], prior_clusters=prior_clusters)
    got = _canon(second["clusters"].to_pandas())
    want = _canon(prior_clusters.to_pandas())
    assert got.equals(want)
    s_got = second["state"].to_pandas().sort_values("entity_id").reset_index(drop=True)
    s_want = first["state"].to_pandas().sort_values("entity_id").reset_index(drop=True)
    assert s_got.equals(s_want)
