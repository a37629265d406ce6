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

from ..functions.hashing import hash_strings, hash_strings_arrow
from ..stages.candidates import generate_candidates, make_kb_blob
from ..stages.clustering import connected_components
from ..stages.mentions import extract_mentions
from ..stages.pairwise import explode_scored_pairs, link_mentions, score_and_link


def _salted_anchor(anchor: np.ndarray, salt: np.ndarray) -> np.ndarray:
    """Numeric salted-anchor hash (no per-row string formatting)."""
    from ..functions.hashing import splitmix64

    with np.errstate(over="ignore"):
        out = splitmix64(
            anchor.astype(np.uint64) ^ splitmix64(salt.astype(np.uint64) + np.uint64(1))
        )
    return (out & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def build_edges(links: ray.data.Dataset, hot_cap: int = 1000) -> ray.data.Dataset:
    """Accepted links → undirected edge list (mention node ↔ entity anchor),
    with salted sub-anchors for hot entities. Anchor hashes are computed
    once per DISTINCT entity per batch (vectorized gather), not per row."""
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
        src = batch["node"].to_numpy(zero_copy_only=False)
        dct = pc.dictionary_encode(batch["entity_id"].combine_chunks())
        inv = dct.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = dct.dictionary.to_pylist()
        anchor_u = hash_strings([f"e|{e}" for e in uniq])
        dst = anchor_u[inv]
        if hot_map:
            for j, e in enumerate(uniq):
                ns = hot_map.get(e)
                if ns:
                    sel = np.nonzero(inv == j)[0]
                    salt = (src[sel].astype(np.uint64) % np.uint64(ns)).astype(np.int64)
                    dst[sel] = _salted_anchor(dst[sel], salt)
        return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})

    edges = linked.map_batches(to_edges, batch_format="pyarrow")
    if hot:
        connectors = []
        for e, ns in hot.items():
            anchor = int(hash_strings([f"e|{e}"])[0])
            salted = _salted_anchor(
                np.full(ns, anchor, dtype=np.int64), np.arange(ns, dtype=np.int64)
            )
            connectors.extend({"src": int(sv), "dst": anchor} for sv in salted)
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


SMALL_LABELS = 50_000_000  # rows; ~800 MB of (node,label) pairs

# the flagship's output-table schemas, in produced column order — the
# canonical definitions live in schemas.py; used here to seed one typed
# empty block per output (below)
from .. import schemas as _schemas  # noqa: E402  (after module constants)

OUT_SCHEMAS = {
    "mentions": _schemas.MENTIONS,
    "scored": _schemas.SCORED,
    "scored_pairs": _schemas.SCORED_PAIRS,
    "links": _schemas.LINKS,
    "clusters": _schemas.CLUSTERS,
    "annotated_documents": _schemas.ANNOTATED_DOCUMENTS,
}


def _ensure_typed(ds: "ray.data.Dataset", schema: pa.Schema) -> "ray.data.Dataset":
    """Union one typed EMPTY block onto an output so a zero-row corpus
    still yields the documented schema (the repo's typed-empty contract,
    cf. scan._typed_empty_like). Needed because map_batches UDFs never
    run on empty inputs, so no stage can type an all-empty pipeline; the
    extra block is empty and costs nothing at scale."""
    return ds.union(ray.data.from_arrow(schema.empty_table()))


def attach_clusters(links: ray.data.Dataset, labels: ray.data.Dataset,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """links + component labels → clusters(doc_id, span_idx, offset,
    cluster_id = decimal string of the component's min node hash). NIL
    mentions become singleton clusters keyed by their own node hash.

    Small label sets broadcast as sorted arrays (searchsorted map-side
    lookup, no shuffle); larger ones fall back to the hash join — the same
    size-based plan choice as connected_components.
    """
    n_labels = labels.count()

    def fmt_from_label(batch: pa.Table, label_col: str) -> pa.Table:
        cid = pc.cast(batch[label_col], pa.string())
        return pa.table(
            {
                "doc_id": batch["doc_id"], "span_idx": batch["span_idx"],
                "offset": batch["offset"], "cluster_id": cid,
            }
        )

    if n_labels <= SMALL_LABELS:
        nodes_l, labs_l = [], []
        for b in labels.iter_batches(batch_format="pyarrow"):
            nodes_l.append(b["node"].to_numpy(zero_copy_only=False))
            labs_l.append(b["label"].to_numpy(zero_copy_only=False))
        if nodes_l:
            nodes = np.concatenate(nodes_l)
            labs = np.concatenate(labs_l)
            order = np.argsort(nodes)
            nodes, labs = nodes[order], labs[order]
        else:
            nodes = np.empty(0, dtype=np.int64)
            labs = np.empty(0, dtype=np.int64)
        lut_ref = ray.put((nodes, labs))

        def lookup(batch: pa.Table) -> pa.Table:
            nds, lbs = ray.get(lut_ref)
            node = batch["node"].to_numpy(zero_copy_only=False)
            if len(nds):
                pos = np.searchsorted(nds, node)
                pos = np.clip(pos, 0, len(nds) - 1)
                found = nds[pos] == node
                lab = np.where(found, lbs[pos], node)  # unlabeled → singleton
            else:
                lab = node
            out = batch.append_column("label", pa.array(lab, pa.int64()))
            return fmt_from_label(out, "label")

        return links.map_batches(lookup, batch_format="pyarrow")

    linked = links.filter(expr="entity_id != 'NIL'")
    nil = links.filter(expr="entity_id == 'NIL'")
    joined = linked.join(labels, "inner", num_partitions, on=("node",), right_on=("node",))
    return joined.map_batches(
        lambda b: fmt_from_label(b, "label"), batch_format="pyarrow"
    ).union(
        nil.map_batches(lambda b: fmt_from_label(b, "node"), batch_format="pyarrow")
    )


def annotate_documents(docs: ray.data.Dataset, links: ray.data.Dataset,
                       num_partitions: int = 16,
                       mode: str = "broadcast") -> ray.data.Dataset:
    """Per-doc mention/link counts with the ``spans`` column passed through
    untouched — the span-sequence-equality invariant surface.

    ``mode="broadcast"`` (default): the per-doc aggregate is (doc_id, two
    ints) — tiny per row — so it broadcasts as sorted hash arrays and
    attaches via searchsorted in one map pass; the spans column never
    moves (zero-copy pass-through, no shuffle). ~24 bytes/doc of driver
    memory: right up to ~10^8 docs.

    ``mode="join"``: the streaming fallback for corpora beyond broadcast
    size. Arrow's hash join rejects list<struct> non-key columns, so the
    spans list rides through the join as an opaque per-row pickled binary
    column and is decoded after."""
    from .. import schemas

    spans_type = pa.list_(schemas.SPAN_STRUCT)

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

    if mode == "broadcast":
        hs, ms, ls = [], [], []
        for b in per_doc.iter_batches(batch_format="pyarrow"):
            hs.append(hash_strings_arrow(b["doc_id"]))
            ms.append(b["n_mentions"].to_numpy(zero_copy_only=False))
            ls.append(b["n_linked"].to_numpy(zero_copy_only=False))
        if hs:
            h = np.concatenate(hs)
            order = np.argsort(h)
            blob = (h[order], np.concatenate(ms)[order], np.concatenate(ls)[order])
        else:
            z = np.empty(0, dtype=np.int64)
            blob = (z, z, z)
        lut_ref = ray.put(blob)

        def attach(batch: pa.Table) -> pa.Table:
            hh, mm, ll = ray.get(lut_ref)
            bh = hash_strings_arrow(batch["doc_id"])
            if len(hh):
                pos = np.clip(np.searchsorted(hh, bh), 0, len(hh) - 1)
                found = hh[pos] == bh
                n_m = np.where(found, mm[pos], 0)
                n_l = np.where(found, ll[pos], 0)
            else:
                n_m = n_l = np.zeros(len(bh), dtype=np.int64)
            return pa.table({
                "doc_id": batch["doc_id"],
                "spans": batch["spans"],  # untouched, zero-copy
                "n_mentions": pa.array(n_m, pa.int64()),
                "n_linked": pa.array(n_l, pa.int64()),
            })

        return docs.map_batches(attach, batch_format="pyarrow")

    def encode(batch: pa.Table) -> pa.Table:
        import pickle

        blobs = [pickle.dumps(v) for v in batch["spans"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "spans_bin": pa.array(blobs, pa.large_binary()),
        })

    encoded = docs.map_batches(encode, batch_format="pyarrow")
    # repartition scrubs Ray-groupby untyped empty blocks before the join
    # (see cluster_links huge-KB fallback)
    joined = encoded.join(per_doc.repartition(num_partitions), "left_outer",
                          num_partitions,
                          on=("doc_id",), right_on=("doc_id",))

    def decode(batch: pa.Table) -> pa.Table:
        import pickle

        spans = pa.array(
            [pickle.loads(b) for b in batch["spans_bin"].to_pylist()], spans_type
        )
        return pa.table({
            "doc_id": batch["doc_id"],
            "spans": spans,
            "n_mentions": pc.fill_null(batch["n_mentions"], 0),
            "n_linked": pc.fill_null(batch["n_linked"], 0),
        })

    return joined.map_batches(decode, batch_format="pyarrow")


def run_pipeline(docs: ray.data.Dataset, entities_tbl: pa.Table, *,
                 k: int = 10, ann_k: int = 5, threshold: float | None = None,
                 concurrency: int | tuple = 4, hot_cap: int = 1000,
                 num_partitions: int = 16,
                 use_general_cc: bool = False,
                 near_dup_edges: bool = False,
                 sn_edges: bool = False,
                 lexical_channel: bool = False,
                 oov_channel: bool = False,
                 score_weights: tuple[float, float] | None = None,
                 pin: str | None = "links",
                 annotate: str | None = "auto") -> dict[str, ray.data.Dataset]:
    """Returns the logical tables {mentions, scored, scored_pairs, links,
    clusters, annotated_documents} as (mostly lazy) Datasets.

    ``use_general_cc=True`` forces the general edge-list → label-propagation
    clustering; the default uses the degree-1 leaf-folding specialization
    (identical labels for pure link graphs — see cluster_links).

    ``pin`` controls the one materialization barrier:

    - ``"links"`` (default): the front (extract → candidates → score)
      streams end-to-end with no barrier; only the SLIM links projection
      (6 flat columns, no nested candidates) is pinned, because clustering
      and annotation both consume it twice. Consuming the mentions /
      scored / scored_pairs outputs re-executes the front — intended for
      the produce-clusters path (the bench / 100-TB shape).
    - ``"scored"``: pins the full scored table (nested candidates
      included) — use when several output tables are consumed.
      Auto-selected when near_dup_edges needs scored twice.
    - ``None``: fully lazy; caller manages re-execution.
    """
    from ..stages.pairwise import THRESHOLD, W_COS, W_STR

    threshold = THRESHOLD if threshold is None else threshold
    w_str, w_cos = score_weights if score_weights is not None else (W_STR, W_COS)
    aliases = [a for al in entities_tbl["aliases"].to_pylist() for a in (al or [])]
    aliases += entities_tbl["subject"].to_pylist()

    mentions = extract_mentions(docs, aliases, concurrency=concurrency)
    if oov_channel:
        # statistical new-word channel (reference HMM path): proposes only
        # surfaces the lexicon does NOT know, so the union never
        # double-proposes; the proposals carry no KB candidates and land
        # as NIL singleton clusters instead of silence
        from ..stages.oov import oov_mentions

        mentions = mentions.union(
            oov_mentions(docs, aliases, concurrency=concurrency))
    kb_ref = ray.put(make_kb_blob(entities_tbl))
    # lexical_channel: the reference's Solr/BM25 retrieval path as a third
    # candidate source (stages/lexical.py) filling slots exact+ann leave
    cands = generate_candidates(mentions, kb_ref, k=k, ann_k=ann_k,
                                lex_k=(k if lexical_channel else 0),
                                concurrency=concurrency)
    scored = cands.map_batches(
        lambda b: score_and_link(b, w_str=w_str, w_cos=w_cos, threshold=threshold),
        batch_format="pyarrow"
    )
    if (near_dup_edges or sn_edges) and pin == "links":
        pin = "scored"  # the edge channels read scored a second time
    if pin == "scored":
        scored = scored.materialize()
    links = link_mentions(scored)
    if pin in ("links", "scored"):
        if pin == "links":
            links = links.materialize()
        # adapt join parallelism to row count: hash-join partitions cost
        # actor spin-up, which dominates below ~500k rows/partition (count
        # on a materialized dataset is metadata, not a new execution)
        n_mentions = (links if pin == "links" else scored).count()
        num_partitions = max(2, min(num_partitions, n_mentions // 500_000 + 2))
    if use_general_cc or near_dup_edges or sn_edges:
        edges = build_edges(links, hot_cap=hot_cap)
        if near_dup_edges:
            # second blocking family: MinHash-LSH near-dup mention pairs
            # become mention↔mention edges (degree>1 ⇒ general CC required)
            edges = edges.union(near_dup_mention_edges(scored))
        if sn_edges:
            # third blocking family: sorted-neighborhood surface window
            # pairs, JW + exact-context-cosine verified
            edges = edges.union(sn_mention_edges(scored))
        labels = connected_components(edges, num_partitions=num_partitions)
        clusters = attach_clusters(links, labels, num_partitions=num_partitions)
    else:
        clusters = cluster_links(links, hot_cap=hot_cap, num_partitions=num_partitions)
    out = {
        "mentions": _ensure_typed(
            scored.drop_columns(["cands", "entity_id", "best_score"]),
            OUT_SCHEMAS["mentions"]),
        "scored": _ensure_typed(scored, OUT_SCHEMAS["scored"]),
        "scored_pairs": _ensure_typed(explode_scored_pairs(scored),
                                      OUT_SCHEMAS["scored_pairs"]),
        "links": _ensure_typed(links, OUT_SCHEMAS["links"]),
        "clusters": _ensure_typed(clusters, OUT_SCHEMAS["clusters"]),
    }
    if annotate == "auto":
        # pinned links → the vectorized broadcast attach (spans never
        # move, no per-row pickle); fully-lazy pin=None keeps the deferred
        # join mode so constructing the dict costs nothing
        annotate = "broadcast" if pin in ("links", "scored") else "join"
    if annotate:
        out["annotated_documents"] = _ensure_typed(
            annotate_documents(docs, links, num_partitions=num_partitions,
                               mode=annotate),
            OUT_SCHEMAS["annotated_documents"])
    return out


def run_pipeline_resumable(docs: ray.data.Dataset, entities_tbl: pa.Table, run_dir: str, *,
                           k: int = 10, ann_k: int = 5, threshold: float | None = None,
                           concurrency: int | tuple = (1, 4), hot_cap: int = 1000,
                           num_partitions: int = 16,
                           checkpoint_partitions: int = 16,
                           input_token: str = "",
                           score_weights: tuple[float, float] | None = None
                           ) -> dict[str, ray.data.Dataset]:
    """Flagship with per-partition checkpoints: the two expensive stages
    (mentions, scored) are materialized to ``run_dir/<stage>/part-<pid>``
    with lineage JSON; a rerun with the same inputs skips completed
    partitions entirely and recomputes only missing ones (north_rule
    resumability: no upstream recompute for finished partitions).

    The stage digest covers the params, the partitioning modulus, the KB
    CONTENT hash, and the docs source identity (its input-file list, or
    ``input_token`` for in-memory/derived datasets) — changing any input
    in the same run_dir invalidates the lineage instead of silently
    serving stale partitions."""
    from ..stages.candidates import generate_candidates, make_kb_blob
    from ..stages.mentions import extract_mentions
    from ..stages.pairwise import (THRESHOLD, W_COS, W_STR,
                                   explode_scored_pairs, link_mentions,
                                   score_and_link)
    from ..state.checkpoint import (
        checkpoint_partitioned, dataset_input_token, stage_digest, table_fingerprint,
    )

    import os

    threshold = THRESHOLD if threshold is None else threshold
    w_str, w_cos = score_weights if score_weights is not None else (W_STR, W_COS)
    aliases = [a for al in entities_tbl["aliases"].to_pylist() for a in (al or [])]
    aliases += entities_tbl["subject"].to_pylist()
    docs_token = input_token or dataset_input_token(docs)
    # score weights MUST be in the digest: a rerun with different weights
    # would otherwise serve the archived scored partitions (stale scores)
    digest = stage_digest(
        f"k={k}|ann_k={ann_k}|thr={threshold}"
        f"|w={w_str},{w_cos}"
        f"|parts={checkpoint_partitions}"
        f"|ents={table_fingerprint(entities_tbl)}"
        f"|docs={docs_token}"
    )

    mentions = extract_mentions(docs, aliases, concurrency=concurrency)
    mentions_ck = checkpoint_partitioned(
        mentions, os.path.join(run_dir, "mentions"), "doc_id", digest,
        num_partitions=checkpoint_partitions)

    kb_ref = ray.put(make_kb_blob(entities_tbl))
    cands = generate_candidates(mentions_ck, kb_ref, k=k, ann_k=ann_k, concurrency=concurrency)
    scored_lazy = cands.map_batches(
        lambda b: score_and_link(b, w_str=w_str, w_cos=w_cos,
                                 threshold=threshold),
        batch_format="pyarrow")
    scored = checkpoint_partitioned(
        scored_lazy, os.path.join(run_dir, "scored"), "doc_id", digest,
        num_partitions=checkpoint_partitions)

    n_mentions = scored.count()
    num_partitions = max(2, min(num_partitions, n_mentions // 500_000 + 2))
    links = link_mentions(scored)
    clusters = cluster_links(links, hot_cap=hot_cap, num_partitions=num_partitions)
    return {
        "mentions": _ensure_typed(mentions_ck, OUT_SCHEMAS["mentions"]),
        "scored": _ensure_typed(scored, OUT_SCHEMAS["scored"]),
        "scored_pairs": _ensure_typed(explode_scored_pairs(scored),
                                      OUT_SCHEMAS["scored_pairs"]),
        "links": _ensure_typed(links, OUT_SCHEMAS["links"]),
        "clusters": _ensure_typed(clusters, OUT_SCHEMAS["clusters"]),
        # scored is checkpoint-backed (parquet), so links re-reads are
        # cheap and the broadcast attach is safe to build here
        "annotated_documents": _ensure_typed(
            annotate_documents(docs, links, num_partitions=num_partitions,
                               mode="broadcast"),
            OUT_SCHEMAS["annotated_documents"]),
    }


def entity_cluster_state(links: ray.data.Dataset) -> ray.data.Dataset:
    """links → per-entity cluster STATE (entity_id, m_min: min linked
    mention node hash, n: linked-mention count). This is the complete
    commutative-monoid state behind the degree-1 clustering: min and sum
    merge associatively, so states from disjoint document batches merge
    into exactly the full-corpus state — the basis of
    :func:`run_pipeline_incremental`."""
    linked = links.filter(expr="entity_id != 'NIL'")
    _N_BUCKETS = 64

    def combine(batch: pa.Table) -> pa.Table:
        part = (
            batch.group_by("entity_id")
            .aggregate([("node", "min"), ("node", "count")])
            .rename_columns(["entity_id", "m_min", "n"])
        )
        bk = hash_strings_arrow(part["entity_id"]) % _N_BUCKETS
        return part.append_column("__bucket", pa.array(bk, pa.int64()))

    def bucket_merge(group: pa.Table) -> pa.Table:
        # Arrow's C group_by inside each of 64 buckets — the same bucketed
        # aggregate pattern as clustering._groupby_min (Ray's native
        # groupby().aggregate is ~80x slower at scale); KB-cardinality
        # partials are merged DISTRIBUTED, not in driver Python loops
        return (
            group.group_by("entity_id")
            .aggregate([("m_min", "min"), ("n", "sum")])
            .rename_columns(["entity_id", "m_min", "n"])
        )

    return (
        linked.select_columns(["entity_id", "node"])
        .map_batches(combine, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_merge, batch_format="pyarrow")
    )


def merge_cluster_states(*states: ray.data.Dataset) -> ray.data.Dataset:
    """Union per-entity states from disjoint document batches into one
    (min of mins, sum of counts) — exact, order-free."""
    _N_BUCKETS = 64

    def rebucket(b: pa.Table) -> pa.Table:
        bk = hash_strings_arrow(b["entity_id"]) % _N_BUCKETS
        return pa.table({
            "entity_id": b["entity_id"],
            "m_min": pc.cast(b["m_min"], pa.int64()),
            "n": pc.cast(b["n"], pa.int64()),
            "__bucket": pa.array(bk, pa.int64()),
        })

    def bucket_merge(group: pa.Table) -> pa.Table:
        return (group.group_by("entity_id")
                .aggregate([("m_min", "min"), ("n", "sum")])
                .rename_columns(["entity_id", "m_min", "n"]))

    u = states[0]
    for s in states[1:]:
        u = u.union(s)
    return (u.map_batches(rebucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_merge, batch_format="pyarrow"))


def _labels_from_state(eids: list, mm: np.ndarray, n: np.ndarray,
                       hot_cap: int) -> np.ndarray:
    """Vector core of the state→label rule: label = min over {m_min,
    anchor hash, salted anchor hashes for entities over hot_cap}."""
    anchors = hash_strings([f"e|{e}" for e in eids])
    lab = np.minimum(mm, anchors)
    for i in np.nonzero(n > hot_cap)[0]:
        ns = int(np.ceil(n[i] / hot_cap))
        salted = _salted_anchor(np.full(ns, anchors[i], dtype=np.int64),
                                np.arange(ns, dtype=np.int64))
        lab[i] = min(lab[i], int(salted.min()))
    return lab


def state_to_labels(state: ray.data.Dataset, *,
                    hot_cap: int = 1000) -> ray.data.Dataset:
    """Per-entity state → residual component label = min over {m_min,
    anchor hash, salted anchor hashes (hot entities)} — matches the
    general CC path's component-min semantics exactly; vectorized per
    batch, the salted loop touches only the hot set (tiny by
    construction)."""
    def to_labels(batch: pa.Table) -> pa.Table:
        eids = batch["entity_id"].to_pylist()
        lab = _labels_from_state(
            eids, batch["m_min"].to_numpy(zero_copy_only=False),
            batch["n"].to_numpy(zero_copy_only=False), hot_cap)
        return pa.table({"entity_id": pa.array(eids, pa.string()),
                         "label": pa.array(lab, pa.int64())})

    return state.map_batches(to_labels, batch_format="pyarrow")


def cluster_links(links: ray.data.Dataset, hot_cap: int = 1000,
                  num_partitions: int = 16) -> ray.data.Dataset:
    """clusters for pure mention→entity link graphs via degree-1 vertex
    elimination — the scalable specialization of build_edges →
    connected_components → attach_clusters.

    Every linked mention has exactly ONE edge (its per-mention argmax
    link), so mention nodes are degree-1 leaves: fold them into per-entity
    (min mention node, count) aggregates — one combiner pass + driver
    merge over KB-cardinality partials — and run component labeling only
    on the RESIDUAL anchor graph (entities + their salted sub-anchors),
    which is KB-sized, not corpus-sized. Mention labels come from a
    broadcast anchor→label map in one scalable map pass.

    Produces IDENTICAL labels to the general path (component min node id,
    including anchor/salted-anchor hashes in the min) — property-tested.
    Use the general connected_components path when mention↔mention edges
    exist (near-dup channel): those mentions are not degree-1.

    At 10^12-doc scale this is standard leaf-folding: the residual graph
    is KB-sized (millions of entities), so the iterative shuffle CC runs
    over millions, not trillions, of nodes.
    """
    merged = entity_cluster_state(links)
    ent_labels = state_to_labels(merged, hot_cap=hot_cap).materialize()
    return assign_entity_labels(links, ent_labels,
                                num_partitions=num_partitions)


def assign_entity_labels(links: ray.data.Dataset,
                         ent_labels: ray.data.Dataset,
                         num_partitions: int = 16) -> ray.data.Dataset:
    """links + per-entity labels → clusters rows (NIL → singleton of the
    mention's own node hash). Small label sets broadcast (searchsorted
    map-side lookup); larger ones fall back to the hash join — the same
    size-based plan choice as connected_components. ``ent_labels`` must
    be materialized."""
    if ent_labels.count() <= SMALL_LABELS:
        # KB-sized label map broadcasts once; lookup per DISTINCT entity
        # per batch (dictionary-encode), no shuffle of the links table
        lut: dict[str, int] = {}
        for b in ent_labels.iter_batches(batch_format="pyarrow"):
            lut.update(zip(b["entity_id"].to_pylist(), b["label"].to_pylist()))
        lut_ref = ray.put(lut)

        def assign(batch: pa.Table) -> pa.Table:
            m = ray.get(lut_ref)
            dct = pc.dictionary_encode(batch["entity_id"].combine_chunks())
            inv = dct.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uniq_lab = np.array([m.get(e, -1) for e in dct.dictionary.to_pylist()],
                                dtype=np.int64)
            labs = uniq_lab[inv]
            nodes = batch["node"].to_numpy(zero_copy_only=False)
            lab = np.where(labs >= 0, labs, nodes)  # NIL → singleton
            cid = pc.cast(pa.array(lab, pa.int64()), pa.string())
            return pa.table({
                "doc_id": batch["doc_id"], "span_idx": batch["span_idx"],
                "offset": batch["offset"], "cluster_id": cid,
            })

        return links.map_batches(assign, batch_format="pyarrow")

    # huge-KB fallback: keyed join instead of a broadcast label map.
    # repartition scrubs the untyped empty blocks Ray's groupby leaves in
    # ent_labels (they crash a hash-join partition that receives only
    # empties — see stages/dedup.py:_drop_losers_keyed)
    joined = links.join(ent_labels.repartition(num_partitions), "left_outer",
                        num_partitions,
                        on=("entity_id",), right_on=("entity_id",))

    def fmt(batch: pa.Table) -> pa.Table:
        nodes = batch["node"].to_numpy(zero_copy_only=False)
        # fill nulls BEFORE to_numpy: a null int64 column converts via
        # float64, which corrupts 63-bit node hashes above 2^53
        isnull = pc.is_null(batch["label"]).to_numpy(zero_copy_only=False)
        labs = pc.fill_null(batch["label"], 0).to_numpy(zero_copy_only=False)
        lab = np.where(isnull, nodes, labs)
        return pa.table({
            "doc_id": batch["doc_id"], "span_idx": batch["span_idx"],
            "offset": batch["offset"],
            "cluster_id": pc.cast(pa.array(lab, pa.int64()), pa.string()),
        })

    return joined.map_batches(fmt, batch_format="pyarrow")


def _changed_label_pairs(prior_state: ray.data.Dataset,
                         new_state: ray.data.Dataset,
                         hot_cap: int) -> "pd.DataFrame":
    """→ (old_label, new_label) pairs for entities whose cluster label
    changes when the new batch's state merges in. Only entities present
    in BOTH states can change (a new-only entity has no prior rows to
    relabel; a prior-only entity's state is untouched), so the co-group
    inner-joins on entity and the result is bounded by the new batch's
    distinct entity count — safe to collect."""
    import pandas as pd

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            bk = hash_strings_arrow(b["entity_id"]) % 64
            return pa.table({
                "entity_id": b["entity_id"],
                "m_min": pc.cast(b["m_min"], pa.int64()),
                "n": pc.cast(b["n"], pa.int64()),
                "__side": pa.array(np.full(b.num_rows, side, np.int8)),
                "__bucket": pa.array(bk, pa.int64()),
            })
        return f

    def diff(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        eid = np.asarray(group["entity_id"].to_pylist(), object)
        mm = group["m_min"].to_numpy(zero_copy_only=False)
        nn = group["n"].to_numpy(zero_copy_only=False)
        p, q = side == 0, side == 1
        common, pi, qi = np.intersect1d(eid[p], eid[q],
                                        return_indices=True)
        if not len(common):
            return pa.table({"old_label": pa.array([], pa.int64()),
                             "new_label": pa.array([], pa.int64())})
        pmm, pnn = mm[p][pi], nn[p][pi]
        old = _labels_from_state(list(common), pmm, pnn, hot_cap)
        merged_mm = np.minimum(pmm, mm[q][qi])
        merged_nn = pnn + nn[q][qi]
        new = _labels_from_state(list(common), merged_mm, merged_nn,
                                 hot_cap)
        ch = old != new
        return pa.table({"old_label": pa.array(old[ch], pa.int64()),
                         "new_label": pa.array(new[ch], pa.int64())})

    pairs = (prior_state.map_batches(tag(0), batch_format="pyarrow")
             .union(new_state.map_batches(tag(1), batch_format="pyarrow"))
             .groupby("__bucket").map_groups(diff, batch_format="pyarrow"))
    return pairs.to_pandas()


def run_pipeline_incremental(new_docs: ray.data.Dataset,
                             entities_tbl: pa.Table, *,
                             prior_state: "ray.data.Dataset | None" = None,
                             prior_clusters: "ray.data.Dataset | None" = None,
                             k: int = 10, ann_k: int = 5,
                             threshold: float | None = None,
                             concurrency: int | tuple = 4,
                             hot_cap: int = 1000,
                             num_partitions: int = 16,
                             score_weights: tuple[float, float] | None = None
                             ) -> dict[str, ray.data.Dataset]:
    """Incremental ER ingestion (default pure-link-graph channel config):
    the expensive front (extract → candidates → score → link) runs on
    the NEW documents only; the archive contributes just its KB-sized
    per-entity state (:func:`entity_cluster_state` output — a
    commutative monoid, so disjoint batches merge exactly) and its
    clusters table.

    Because cluster ids are component-MIN node hashes, a new mention can
    lower its entity's label; only those entities' prior rows need
    rewriting. The old→new label map is bounded by the new batch's
    distinct entity count and broadcasts once — the archive is never
    re-linked, re-scored, or re-clustered, only streamed through one
    relabel map (and only when something changed).

    Returns {clusters, links, state}: ``clusters`` covers archive ∪ new
    and equals a full :func:`run_pipeline` over the union
    (equivalence-tested); ``state`` is the merged per-entity state to
    persist for the next increment."""
    from ..stages.pairwise import THRESHOLD, W_COS, W_STR

    threshold = THRESHOLD if threshold is None else threshold
    w_str, w_cos = score_weights if score_weights is not None else (W_STR, W_COS)
    aliases = [a for al in entities_tbl["aliases"].to_pylist()
               for a in (al or [])]
    aliases += entities_tbl["subject"].to_pylist()

    mentions = extract_mentions(new_docs, aliases, concurrency=concurrency)
    kb_ref = ray.put(make_kb_blob(entities_tbl))
    cands = generate_candidates(mentions, kb_ref, k=k, ann_k=ann_k,
                                concurrency=concurrency)
    scored = cands.map_batches(
        lambda b: score_and_link(b, w_str=w_str, w_cos=w_cos,
                                 threshold=threshold),
        batch_format="pyarrow")
    links_new = link_mentions(scored).materialize()

    new_state = entity_cluster_state(links_new).materialize()
    if prior_state is None:
        merged = new_state
    else:
        merged = merge_cluster_states(prior_state, new_state).materialize()
    labels = state_to_labels(merged, hot_cap=hot_cap).materialize()
    clusters_new = assign_entity_labels(links_new, labels,
                                        num_partitions=num_partitions)
    if prior_clusters is None:
        return {"clusters": clusters_new, "links": links_new,
                "state": merged}

    changed = _changed_label_pairs(prior_state, new_state, hot_cap)
    if len(changed):
        old = changed["old_label"].to_numpy(np.int64)
        new = changed["new_label"].to_numpy(np.int64)
        o = np.argsort(old)
        old_s, new_s = old[o], new[o]
        map_ref = ray.put((old_s, new_s))

        def relabel(b: pa.Table) -> pa.Table:
            om, nm = ray.get(map_ref)
            cid = np.asarray(
                [int(x) for x in b["cluster_id"].to_pylist()], np.int64)
            pos = np.searchsorted(om, cid)
            pos_cl = np.minimum(pos, len(om) - 1)
            hit = (pos < len(om)) & (om[pos_cl] == cid)
            cid[hit] = nm[pos_cl[hit]]
            return pa.table({
                "doc_id": b["doc_id"], "span_idx": b["span_idx"],
                "offset": b["offset"],
                "cluster_id": pc.cast(pa.array(cid, pa.int64()),
                                      pa.string()),
            })

        prior_clusters = prior_clusters.map_batches(
            relabel, batch_format="pyarrow")
    clusters = prior_clusters.union(clusters_new)
    return {"clusters": clusters, "links": links_new, "state": merged}


class FusedLinkStage:
    """Operator fusion of mention extraction → candidate generation →
    scoring into one actor: documents batch in, scored mentions batch out.

    One actor pool instead of three chained operators removes two pool
    ramp-ups and two object-store hops for the mention-level intermediate
    (the widest data in the pipeline). The modular stages remain the
    composable API; this is the packed execution configuration the bench
    uses (``run_pipeline(fused=True)``)."""

    def __init__(self, alias_ref, kb_ref, k: int = 10, ann_k: int = 5,
                 threshold: float | None = None, stopwords=None,
                 score_weights: "tuple[float, float] | None" = None):
        from ..stages.candidates import CandidateGenerator
        from ..stages.mentions import DEFAULT_STOPWORDS, MentionExtractor
        from ..stages.pairwise import THRESHOLD, W_COS, W_STR

        self.extract = MentionExtractor(
            alias_ref, stopwords=stopwords or DEFAULT_STOPWORDS)
        self.gen = CandidateGenerator(kb_ref, k=k, ann_k=ann_k)
        self.threshold = THRESHOLD if threshold is None else threshold
        self.w_str, self.w_cos = (score_weights if score_weights is not None
                                  else (W_STR, W_COS))

    def __call__(self, batch: pa.Table) -> pa.Table:
        mentions = self.extract(batch)
        cands = self.gen(mentions)
        return score_and_link(cands, w_str=self.w_str, w_cos=self.w_cos,
                              threshold=self.threshold)


def run_pipeline_fused(docs: ray.data.Dataset, entities_tbl: pa.Table, *,
                       k: int = 10, ann_k: int = 5, threshold: float | None = None,
                       concurrency: int | tuple = 4, hot_cap: int = 1000,
                       num_partitions: int = 16,
                       score_weights: tuple[float, float] | None = None,
                       batch_size: int = 256) -> dict[str, ray.data.Dataset]:
    """run_pipeline with the front three stages fused into one actor pool.
    Identical outputs (the fused stage applies the same callables)."""
    aliases = [a for al in entities_tbl["aliases"].to_pylist() for a in (al or [])]
    aliases += entities_tbl["subject"].to_pylist()
    alias_ref = ray.put(aliases)
    kb_ref = ray.put(make_kb_blob(entities_tbl))
    if isinstance(concurrency, int):
        concurrency = (1, max(1, concurrency))

    scored = docs.map_batches(
        FusedLinkStage,
        fn_constructor_kwargs={"alias_ref": alias_ref, "kb_ref": kb_ref,
                               "k": k, "ann_k": ann_k, "threshold": threshold,
                               "score_weights": score_weights},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    # pin only the slim links projection (see run_pipeline pin="links")
    links = link_mentions(scored).materialize()
    n_mentions = links.count()
    num_partitions = max(2, min(num_partitions, n_mentions // 500_000 + 2))
    clusters = cluster_links(links, hot_cap=hot_cap, num_partitions=num_partitions)
    return {
        "mentions": _ensure_typed(
            scored.drop_columns(["cands", "entity_id", "best_score"]),
            OUT_SCHEMAS["mentions"]),
        "scored": _ensure_typed(scored, OUT_SCHEMAS["scored"]),
        "scored_pairs": _ensure_typed(explode_scored_pairs(scored),
                                      OUT_SCHEMAS["scored_pairs"]),
        "links": _ensure_typed(links, OUT_SCHEMAS["links"]),
        "clusters": _ensure_typed(clusters, OUT_SCHEMAS["clusters"]),
        "annotated_documents": _ensure_typed(
            annotate_documents(docs, links, num_partitions=num_partitions,
                               mode="broadcast"),
            OUT_SCHEMAS["annotated_documents"]),
    }


def near_dup_mention_edges(scored: ray.data.Dataset,
                           jaccard_threshold: float = 0.75,
                           cosine_threshold: float = 0.8,
                           num_perm: int = 32, num_bands: int = 8,
                           max_pairs_per_bucket: int = 5_000,
                           num_partitions: int = 8,
                           pair_mode: str = "auto") -> ray.data.Dataset:
    """Second blocking family feeding clustering: MinHash-LSH over the
    normalized mention surface, verified by signature Jaccard AND context
    cosine. Accepted pairs become mention↔mention edges for the GENERAL
    clustering path (these mentions are no longer degree-1 — FIXTURES.md
    edge-case 9, the A–B/B–C transitive chain).

    The LSH bands are the D5 near-dup family from SURVEY.md §2.7 (absent
    in the reference, mandated by the north-star contract); the cosine
    check keeps same-surface-different-entity mentions apart (hot-alias
    precision guard — surface similarity alone would merge every "alpha
    prime" mention).

    TWO-PHASE SHUFFLE (the same 100-TB shape as
    ``stages/dedup.lsh_candidate_pairs``): the band stage ships only
    (band_key, node, 16-byte b-bit minhash sketch, 8-byte SRP context
    sketch) rows — the full signature and the context VECTOR, which the
    round-3 version replicated ×num_bands through the shuffle, never
    ride it. In-bucket candidate pairs are prefiltered by BOTH sketch
    Hamming distances (each cut at +4σ above its threshold's expected
    distance), then the surviving pairs join back their two full
    (signature, vector) payloads for the exact Jaccard+cosine verify —
    broadcast below ``_BROADCAST_PAIRS_CAP`` candidates, distributed
    two-hash-join above (``pair_mode`` auto protocol)."""
    import math

    import pandas as pd

    from ..functions.embed import embed_texts
    from ..functions.minhash import band_keys, signature_matrix
    from ..stages.dedup import (_BROADCAST_PAIRS_CAP, _distinct_pairs,
                                _pack_bbit_sketch, _popcount64_2d, _sketch_cut)
    from ..stages.pairwise import mention_node_hashes

    U64 = np.uint64
    _VBITS = 64
    p_cos = math.acos(min(max(cosine_threshold, -1.0), 1.0)) / math.pi
    vcut = int(np.ceil(_VBITS * p_cos
                       + 4.0 * math.sqrt(_VBITS * p_cos * (1.0 - p_cos)))) + 2
    jcut = _sketch_cut(jaccard_threshold, num_perm)

    def vec_sketch(vecs: np.ndarray) -> np.ndarray:
        """64-plane SRP sign code of each context vector (fixed planes —
        deterministic across workers)."""
        d = vecs.shape[1]
        rng = np.random.default_rng(4242)
        planes = rng.normal(size=(d, _VBITS)).astype(np.float32)
        bits = (vecs @ planes) > 0
        w = (U64(1) << np.arange(_VBITS, dtype=U64))
        return (bits.astype(U64) * w).sum(axis=1).view(np.int64)

    def with_node(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "node", pa.array(mention_node_hashes(batch), pa.int64()))

    mcols = scored.select_columns(
        ["doc_id", "span_idx", "offset", "norm_mention",
         "context_left", "context_right"]
    ).map_batches(with_node, batch_format="pyarrow")

    def ctx_of(batch: pa.Table) -> list[str]:
        return [f"{l} {r}" for l, r in zip(batch["context_left"].to_pylist(),
                                           batch["context_right"].to_pylist())]

    def band_rows(batch: pa.Table) -> pa.Table:
        surf = batch["norm_mention"].to_pylist()
        sigs = signature_matrix(surf, num_perm=num_perm, k=3)
        bks = band_keys(sigs, num_bands=num_bands)
        sk0, sk1 = _pack_bbit_sketch(sigs)
        vsk = vec_sketch(embed_texts(ctx_of(batch)))
        node = batch["node"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        return pa.table({
            "band_key": pa.array(bks.reshape(-1), pa.int64()),
            "node": pa.array(np.repeat(node, num_bands), pa.int64()),
            "__sk0": pa.array(np.repeat(sk0, num_bands), pa.int64()),
            "__sk1": pa.array(np.repeat(sk1, num_bands), pa.int64()),
            "__vsk": pa.array(np.repeat(vsk, num_bands), pa.int64()),
        })

    rows = mcols.map_batches(band_rows, batch_format="pyarrow")

    # coarse-bucket the band shuffle (band_keys are splitmix-finalized, so
    # the low bits are uniform) + per-key row cap (quadratic skew guard)
    max_rows_per_key = int((1 + np.sqrt(1 + 8 * max_pairs_per_bucket)) // 2)
    _CB = 256

    def coarse(b: pa.Table) -> pa.Table:
        cb = pc.bit_wise_and(b["band_key"], pa.scalar(_CB - 1, pa.int64()))
        return b.append_column("__cb", cb)

    def cand_pairs_bulk(group: pa.Table) -> pa.Table:
        # Arrow-native: lexsort + segment arithmetic replace the pandas
        # self-merge (which materialized every within-key row pair as a
        # frame before the filters); dedup/cap/pair-expansion all run on
        # the raw int64 buffers. node_a < node_b falls out of the sorted
        # ai < bi expansion over deduped (strictly ascending) nodes.
        _empty = pa.table({"id_a": pa.array([], pa.int64()),
                           "id_b": pa.array([], pa.int64())})
        bk = group["band_key"].to_numpy(zero_copy_only=False)
        nd = group["node"].to_numpy(zero_copy_only=False)
        o = np.lexsort((nd, bk))
        bk, nd = bk[o], nd[o]
        sk0 = group["__sk0"].to_numpy(zero_copy_only=False)[o]
        sk1 = group["__sk1"].to_numpy(zero_copy_only=False)[o]
        vsk = group["__vsk"].to_numpy(zero_copy_only=False)[o]
        n = len(bk)
        uniq = np.ones(n, dtype=bool)
        uniq[1:] = (bk[1:] != bk[:-1]) | (nd[1:] != nd[:-1])
        bk, nd = bk[uniq], nd[uniq]
        sk0, sk1, vsk = sk0[uniq], sk1[uniq], vsk[uniq]

        def _segments(keys: np.ndarray):
            new = np.ones(len(keys), dtype=bool)
            new[1:] = keys[1:] != keys[:-1]
            starts = np.nonzero(new)[0]
            seg = np.cumsum(new) - 1
            return starts, np.diff(np.append(starts, len(keys))), seg

        starts, cnt, seg = _segments(bk)
        cap = (np.arange(len(bk)) - starts[seg]) < max_rows_per_key
        bk, nd = bk[cap], nd[cap]
        sk0, sk1, vsk = sk0[cap], sk1[cap], vsk[cap]
        if not len(bk):
            return _empty
        starts, cnt, seg = _segments(bk)
        pos = np.arange(len(bk)) - starts[seg]
        reps = cnt[seg] - pos - 1
        ai = np.repeat(np.arange(len(bk)), reps)
        if not len(ai):
            return _empty
        off = (np.arange(int(reps.sum()))
               - np.repeat(np.concatenate([[0], np.cumsum(reps)[:-1]]),
                           reps) + 1)
        bi = ai + off
        hj = (_popcount64_2d((sk0[ai] ^ sk0[bi]).view(U64))
              + _popcount64_2d((sk1[ai] ^ sk1[bi]).view(U64)))
        hv = _popcount64_2d((vsk[ai] ^ vsk[bi]).view(U64))
        keep = (hj <= jcut) & (hv <= vcut)
        return pa.table({"id_a": pa.array(nd[ai[keep]]),
                         "id_b": pa.array(nd[bi[keep]])})

    cand = (rows.map_batches(coarse, batch_format="pyarrow")
            .groupby("__cb").map_groups(cand_pairs_bulk,
                                        batch_format="pyarrow")
            .materialize())

    def _typed_empty() -> ray.data.Dataset:
        return ray.data.from_arrow(pa.table({
            "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}))

    n_cand = cand.count()
    if n_cand == 0:
        return _typed_empty()
    if pair_mode == "auto":
        pair_mode = "broadcast" if n_cand <= _BROADCAST_PAIRS_CAP else "join"

    def payload(batch: pa.Table) -> pa.Table:
        """(node, packed signature, packed unit context vector) — built
        only for verify; joins/scans by node, never ×num_bands."""
        surf = batch["norm_mention"].to_pylist()
        sigs = signature_matrix(surf, num_perm=num_perm, k=3)
        vecs = embed_texts(ctx_of(batch))
        return pa.table({
            "node": batch["node"],
            "__sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
            "__vec": pa.array([v.tobytes() for v in vecs], pa.binary()),
        })

    def verified(ids_a: pa.Array, ids_b: pa.Array, sig_a, sig_b,
                 vec_a, vec_b) -> pa.Table:
        Sa = np.frombuffer(b"".join(sig_a), U64).reshape(-1, num_perm)
        Sb = np.frombuffer(b"".join(sig_b), U64).reshape(-1, num_perm)
        est = (Sa == Sb).mean(axis=1)
        Va = np.frombuffer(b"".join(vec_a), np.float32).reshape(len(sig_a), -1)
        Vb = np.frombuffer(b"".join(vec_b), np.float32).reshape(len(sig_b), -1)
        cos = np.einsum("ij,ij->i", Va, Vb)
        keep = pa.array(np.nonzero(
            (est >= jaccard_threshold) & (cos >= cosine_threshold))[0],
            pa.int64())
        return pa.table({"src": ids_a.take(keep), "dst": ids_b.take(keep)})

    if pair_mode == "broadcast":
        pairs_pd = cand.to_pandas().drop_duplicates(subset=["id_a", "id_b"])
        need_ref = ray.put(np.unique(np.concatenate(
            [pairs_pd["id_a"].to_numpy(), pairs_pd["id_b"].to_numpy()])))

        def pick(b: pa.Table) -> pa.Table:
            mask = np.isin(b["node"].to_numpy(zero_copy_only=False),
                           ray.get(need_ref))
            return payload(b.filter(pa.array(mask)))

        got = mcols.map_batches(pick, batch_format="pyarrow").to_pandas()
        sig = dict(zip(got["node"], got["__sig"]))
        vec = dict(zip(got["node"], got["__vec"]))
        out = verified(pa.array(pairs_pd["id_a"].to_numpy(), pa.int64()),
                       pa.array(pairs_pd["id_b"].to_numpy(), pa.int64()),
                       [sig[i] for i in pairs_pd["id_a"]],
                       [sig[i] for i in pairs_pd["id_b"]],
                       [vec[i] for i in pairs_pd["id_a"]],
                       [vec[i] for i in pairs_pd["id_b"]])
        if out.num_rows == 0:
            return _typed_empty()
        return ray.data.from_arrow(out)

    # join mode: distinct pairs join their two payloads back — no
    # pair-scaled driver state (the 100-TB path)
    pairs_d = _distinct_pairs(cand, num_partitions)

    def as_side(side: str):
        def prep(b: pa.Table) -> pa.Table:
            t = payload(b)
            return t.rename_columns([f"id_{side}", f"__sig_{side}",
                                     f"__vec_{side}"])
        return prep

    side_a = mcols.map_batches(as_side("a"), batch_format="pyarrow")
    side_b = mcols.map_batches(as_side("b"), batch_format="pyarrow")
    withp = (pairs_d.join(side_a, "inner", num_partitions,
                          on=("id_a",), right_on=("id_a",))
             # scrub the zero-column blocks a join emits for empty
             # partitions before the chained second join (a partition
             # fed only those fails — stages/joins.drop_empty_blocks)
             .repartition(num_partitions)
             .join(side_b, "inner", num_partitions,
                   on=("id_b",), right_on=("id_b",)))

    def verify_batch(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return verified(b["id_a"].combine_chunks(), b["id_b"].combine_chunks(),
                        b["__sig_a"].to_pylist(), b["__sig_b"].to_pylist(),
                        b["__vec_a"].to_pylist(), b["__vec_b"].to_pylist())

    out = withp.map_batches(verify_batch, batch_format="pyarrow")
    if out.count() == 0:
        return _typed_empty()
    return out


def sn_mention_edges(scored: ray.data.Dataset, *, window: int = 4,
                     jw_threshold: float = 0.90,
                     cosine_threshold: float = 0.8,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """THIRD blocking family feeding clustering: sorted-neighborhood
    over the normalized-surface byte order (Hernández-Stolfo) — candidate
    pairs within ``window`` positions of the global surface ordering,
    O(n·w) candidates by construction. Catches typo-variants whose
    3-shingle overlap is too low for the LSH bands (e.g. one edit in a
    short surface kills most shingles but not byte-prefix adjacency).

    Precision guards before a pair becomes an edge: exact Jaro-Winkler
    on the surfaces (≥ ``jw_threshold``) AND EXACT context cosine
    (≥ ``cosine_threshold``) — adjacency in sort order alone must never
    merge clusters. Unlike the near-dup channel (whose candidate volume
    forces a sketch prefilter before the exact verify), SN candidates
    are O(n·w), so the full context vector rides the pair join directly
    and the verify is exact from the start.

    Scale shape: candidates via stages/blocking.sorted_neighborhood_pairs
    (range-partitioned rank, boundary-replicated exactly-once pairs);
    the verify joins each side's (surface, context-sketch) payload back
    with two slim co-groups — pairs are O(n·w), so the join-back moves
    less than one extra copy of the mention table."""
    from ..functions.embed import embed_texts
    from ..functions.strsim import jaro_winkler_batch
    from ..stages.blocking import sorted_neighborhood_pairs, surface_order_keys
    from ..stages.pairwise import mention_node_hashes
    from ..stages.windows import _add_key_bucket

    def prep(batch: pa.Table) -> pa.Table:
        node = mention_node_hashes(batch)
        # byte-prefix order key (63-bit) — vectorized buffer scatter
        okey = surface_order_keys(batch["norm_mention"])
        ctx = [f"{l} {r}" for l, r in zip(
            batch["context_left"].to_pylist(),
            batch["context_right"].to_pylist())]
        vecs = embed_texts(ctx).astype(np.float32)
        # binary blob per row: Ray's sort-based groupby rejects plain
        # list<float> payloads (non-tensor lists), binary passes — the
        # same trick as the dedup signature blobs
        from ..stages.multimodal import _binary_from_matrix
        vec = _binary_from_matrix(
            np.ascontiguousarray(vecs).view(np.uint8).reshape(
                len(vecs), -1))
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "okey": pa.array(okey),
            "surf": batch["norm_mention"],
            "vec": vec,
        })

    m = scored.select_columns(
        ["doc_id", "span_idx", "offset", "norm_mention",
         "context_left", "context_right"]
    ).map_batches(prep, batch_format="pyarrow").materialize()

    pairs = sorted_neighborhood_pairs(m, val_col="okey", id_col="node",
                                      window=window,
                                      num_buckets=num_buckets)

    _COLS = ("k", "id_a", "id_b", "surf_a", "vec_a", "surf_b", "vec_b")

    def _full(cols: dict, n: int, side_flag: int) -> pa.Table:
        # one fixed schema for both union sides (placeholders where a
        # column is not yet known)
        out = {}
        for c in _COLS:
            if c in cols:
                out[c] = cols[c]
            elif c.startswith("surf"):
                out[c] = pa.array([""] * n, pa.string())
            elif c.startswith("vec"):
                out[c] = pa.array([b""] * n, pa.binary())
            else:
                out[c] = pa.array(np.zeros(n, np.int64))
        out["__side"] = pa.array(np.full(n, side_flag, np.int8))
        return pa.table(out)

    def attach(pairs_ds: ray.data.Dataset, side: str) -> ray.data.Dataset:
        def tag_p(b: pa.Table) -> pa.Table:
            cols = {"k": b[f"id_{side}"], "id_a": b["id_a"],
                    "id_b": b["id_b"]}
            for c in ("surf_a", "vec_a", "surf_b", "vec_b"):
                if c in b.schema.names and not c.endswith(side):
                    cols[c] = b[c]
            return _full(cols, b.num_rows, 1)

        def tag_m(b: pa.Table) -> pa.Table:
            return _full({"k": b["node"], f"surf_{side}": b["surf"],
                          f"vec_{side}": b["vec"]}, b.num_rows, 0)

        tagged = (pairs_ds.map_batches(tag_p, batch_format="pyarrow")
                  .union(m.map_batches(tag_m, batch_format="pyarrow"))
                  .map_batches(_add_key_bucket("k"),
                               batch_format="pyarrow"))

        def join(g: pa.Table) -> pa.Table:
            # Arrow-native: searchsorted the pair rows' k against the
            # (unique) mention nodes, gather BOTH sides' columns by
            # take — the string/binary payloads never convert to pandas
            sides = g["__side"].to_numpy(zero_copy_only=False)
            k = g["k"].to_numpy(zero_copy_only=False)
            midx = np.nonzero(sides == 0)[0]
            pidx = np.nonzero(sides == 1)[0]
            mk = k[midx]
            o = np.argsort(mk, kind="stable")
            mk, msorted = mk[o], midx[o]
            pk = k[pidx]
            if len(mk) and len(pk):
                pos = np.clip(np.searchsorted(mk, pk), 0, len(mk) - 1)
                ok = mk[pos] == pk
            else:
                pos = np.zeros(len(pk), np.int64)
                ok = np.zeros(len(pk), bool)
            pr_take = pa.array(pidx[ok], pa.int64())
            pm_take = pa.array(msorted[pos[ok]] if len(mk)
                               else np.array([], np.int64), pa.int64())
            out = {c: g[c].take(pr_take) for c in ("id_a", "id_b")}
            for c in ("surf_a", "vec_a", "surf_b", "vec_b"):
                out[c] = g[c].take(pm_take if c.endswith(side)
                                   else pr_take)
            return pa.table(out)

        return tagged.groupby("__kb").map_groups(join,
                                                 batch_format="pyarrow")

    withp = attach(attach(pairs.drop_columns(["dist"]), "a"), "b")
    # after both attaches every payload column is real (placeholders only
    # ever existed on rows that inner-merged them away)

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        jw = jaro_winkler_batch(b["surf_a"].to_pylist(),
                                b["surf_b"].to_pylist())
        Va = np.stack([np.frombuffer(v, np.float32)
                       for v in b["vec_a"].to_pylist()]).astype(np.float64)
        Vb = np.stack([np.frombuffer(v, np.float32)
                       for v in b["vec_b"].to_pylist()]).astype(np.float64)
        na = np.maximum(np.linalg.norm(Va, axis=1), 1e-12)
        nb = np.maximum(np.linalg.norm(Vb, axis=1), 1e-12)
        cos = (Va * Vb).sum(axis=1) / (na * nb)
        keep = (jw >= jw_threshold) & (cos >= cosine_threshold)
        return pa.table({
            "src": pc.array_filter(b["id_a"], pa.array(keep)),
            "dst": pc.array_filter(b["id_b"], pa.array(keep)),
        })

    out = withp.map_batches(verify, batch_format="pyarrow")
    if out.count() == 0:
        return ray.data.from_arrow(pa.table({
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64())}))
    return out
