"""The flagship pipeline: interleaved documents + KB → mentions →
blocking → candidates → pairwise scores → links → transitive clusters.

End-to-end reference lifecycle being re-created (SURVEY.md §3.2, the
``entity_sort`` predict path): alias-dict mention extraction → exact-alias
candidate lookup + dense backfill with precedence → pairwise scoring →
per-mention best link — extended with transitive clustering and per-doc
annotation, all as streaming Ray Data stages.

Skew handling (north_rule): entity anchors whose linked-mention count
exceeds ``hot_cap`` are split into salted sub-anchors connected to the
primary anchor, bounding any single join group at ~hot_cap without
changing the computed components.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import hash_strings
from ..stages.candidates import generate_candidates, make_kb_blob
from ..stages.clustering import connected_components
from ..stages.mentions import extract_mentions
from ..stages.pairwise import explode_scored_pairs, link_mentions, score_and_link


def _mention_node_hashes(batch: pa.Table) -> np.ndarray:
    keys = [
        f"m|{d}|{s}|{o}"
        for d, s, o in zip(batch["doc_id"].to_pylist(), batch["span_idx"].to_pylist(),
                           batch["offset"].to_pylist())
    ]
    return hash_strings(keys)


def build_edges(links: ray.data.Dataset, hot_cap: int = 1000) -> ray.data.Dataset:
    """Accepted links → undirected edge list (mention node ↔ entity anchor),
    with salted sub-anchors for hot entities."""
    linked = links.filter(expr="entity_id != 'NIL'")

    # per-entity degree (combiner + small groupby), driver-collapsed: the
    # hot set is tiny by construction (only entities over the cap)
    def partial_counts(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by("entity_id").aggregate([("entity_id", "count")])
            .rename_columns(["entity_id", "n"])
        )

    from ray.data.aggregate import Sum

    counts = (
        linked.select_columns(["entity_id"])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("entity_id")
        .aggregate(Sum("n", alias_name="n"))
    )
    hot: dict[str, int] = {}
    for b in counts.filter(expr=f"n > {hot_cap}").iter_batches(batch_format="pyarrow"):
        for e, n in zip(b["entity_id"].to_pylist(), b["n"].to_pylist()):
            hot[e] = int(np.ceil(n / hot_cap))
    hot_ref = ray.put(hot)

    def to_edges(batch: pa.Table) -> pa.Table:
        hot_map = ray.get(hot_ref)
        src = _mention_node_hashes(batch)
        eids = batch["entity_id"].to_pylist()
        anchors = []
        for i, e in enumerate(eids):
            ns = hot_map.get(e)
            anchors.append(f"e|{e}" if not ns else f"e|{e}#s{int(src[i]) % ns}")
        dst = hash_strings(anchors)
        return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})

    edges = linked.map_batches(to_edges, batch_format="pyarrow")
    if hot:
        connectors = [
            {"src": int(hash_strings([f"e|{e}#s{s}"])[0]), "dst": int(hash_strings([f"e|{e}"])[0])}
            for e, ns in hot.items()
            for s in range(ns)
        ]
        conn = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([c["src"] for c in connectors], pa.int64()),
                    "dst": pa.array([c["dst"] for c in connectors], pa.int64()),
                }
            )
        )
        edges = edges.union(conn)
    return edges


def attach_clusters(links: ray.data.Dataset, labels: ray.data.Dataset,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """links + component labels → clusters(doc_id, span_idx, offset,
    cluster_id). NIL mentions become singleton clusters keyed by their own
    node hash."""

    def with_node(batch: pa.Table) -> pa.Table:
        return batch.append_column("node", pa.array(_mention_node_hashes(batch), pa.int64()))

    keyed = links.map_batches(with_node, batch_format="pyarrow")
    linked = keyed.filter(expr="entity_id != 'NIL'")
    nil = keyed.filter(expr="entity_id == 'NIL'")

    joined = linked.join(labels, "inner", num_partitions, on=("node",), right_on=("node",))

    def fmt(batch: pa.Table) -> pa.Table:
        cid = [f"c{v:016x}" for v in batch["label"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"], "span_idx": batch["span_idx"],
                "offset": batch["offset"],
                "cluster_id": pa.array(cid, pa.string()),
            }
        )

    def fmt_nil(batch: pa.Table) -> pa.Table:
        cid = [f"c{v:016x}" for v in batch["node"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"], "span_idx": batch["span_idx"],
                "offset": batch["offset"],
                "cluster_id": pa.array(cid, pa.string()),
            }
        )

    return joined.map_batches(fmt, batch_format="pyarrow").union(
        nil.map_batches(fmt_nil, batch_format="pyarrow")
    )


def annotate_documents(docs: ray.data.Dataset, links: ray.data.Dataset,
                       num_partitions: int = 16) -> ray.data.Dataset:
    """Per-doc mention/link counts with the ``spans`` column passed through
    untouched — the span-sequence-equality invariant surface.

    Arrow's hash join rejects list<struct> non-key columns, so this is a
    co-group join: tag-union both sides and merge per doc_id group — the
    shuffle moves nested columns opaquely, which joins cannot.
    """
    from .. import schemas

    def partial(batch: pa.Table) -> pa.Table:
        linked = pc.cast(pc.not_equal(batch["entity_id"], "NIL"), pa.int64())
        t = pa.table({"doc_id": batch["doc_id"],
                      "one": pa.array(np.ones(batch.num_rows, np.int64)),
                      "linked": linked})
        return t.group_by("doc_id").aggregate([("one", "sum"), ("linked", "sum")]).rename_columns(
            ["doc_id", "n_mentions", "n_linked"])

    from ray.data.aggregate import Sum

    per_doc = (
        links.map_batches(partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_mentions", alias_name="n_mentions"), Sum("n_linked", alias_name="n_linked"))
    )

    spans_type = pa.list_(schemas.SPAN_STRUCT)

    def tag_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "doc_id": batch["doc_id"], "spans": batch["spans"],
            "n_mentions": pa.nulls(n, pa.int64()), "n_linked": pa.nulls(n, pa.int64()),
            "tag": pa.array(np.zeros(n, np.int8)),
        })

    def tag_counts(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "doc_id": batch["doc_id"], "spans": pa.nulls(n, spans_type),
            "n_mentions": pc.cast(batch["n_mentions"], pa.int64()),
            "n_linked": pc.cast(batch["n_linked"], pa.int64()),
            "tag": pa.array(np.ones(n, np.int8)),
        })

    unioned = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        per_doc.map_batches(tag_counts, batch_format="pyarrow")
    )

    def merge(group: pa.Table) -> pa.Table:
        doc_rows = group.filter(pc.equal(group["tag"], 0))
        cnt_rows = group.filter(pc.equal(group["tag"], 1))
        n_m = cnt_rows["n_mentions"][0].as_py() if cnt_rows.num_rows else 0
        n_l = cnt_rows["n_linked"][0].as_py() if cnt_rows.num_rows else 0
        n = doc_rows.num_rows
        return pa.table({
            "doc_id": doc_rows["doc_id"], "spans": doc_rows["spans"],
            "n_mentions": pa.array([n_m] * n, pa.int64()),
            "n_linked": pa.array([n_l] * n, pa.int64()),
        })

    return unioned.groupby("doc_id").map_groups(merge, batch_format="pyarrow")


def run_pipeline(docs: ray.data.Dataset, entities_tbl: pa.Table, *,
                 k: int = 10, ann_k: int = 5, threshold: float | None = None,
                 concurrency: int | tuple = 4, hot_cap: int = 1000,
                 num_partitions: int = 16) -> dict[str, ray.data.Dataset]:
    """Returns the logical tables {mentions, scored, scored_pairs, links,
    clusters, annotated_documents} as (mostly lazy) Datasets."""
    from ..stages.pairwise import THRESHOLD

    threshold = THRESHOLD if threshold is None else threshold
    aliases = [a for al in entities_tbl["aliases"].to_pylist() for a in (al or [])]
    aliases += entities_tbl["subject"].to_pylist()

    mentions = extract_mentions(docs, aliases, concurrency=concurrency)
    kb_ref = ray.put(make_kb_blob(entities_tbl))
    cands = generate_candidates(mentions, kb_ref, k=k, ann_k=ann_k, concurrency=concurrency)
    scored = cands.map_batches(
        lambda b: score_and_link(b, threshold=threshold), batch_format="pyarrow"
    ).materialize()  # consumed by three downstream branches — pin once
    links = link_mentions(scored)
    edges = build_edges(links, hot_cap=hot_cap)
    labels = connected_components(edges, num_partitions=num_partitions)
    clusters = attach_clusters(links, labels, num_partitions=num_partitions)
    return {
        "mentions": scored.drop_columns(["cands", "entity_id", "best_score"]),
        "scored": scored,
        "scored_pairs": explode_scored_pairs(scored),
        "links": links,
        "clusters": clusters,
        "annotated_documents": annotate_documents(docs, links, num_partitions=num_partitions),
    }
