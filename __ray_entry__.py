"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

No ``ray.init`` / ``ray.shutdown`` here or in the library code — sessions
are owned by the caller (driver, bench.py, pytest fixture).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship link-and-cluster pipeline over the interleaved corpus derived
    from /root/testdata/sf0.001 (TESTDATA.md). Returns the clusters table."""
    from entity_linking_ray.pipelines.link_and_cluster import run_pipeline
    from entity_linking_ray.testdata import derive_documents, derive_entities

    docs = derive_documents(SF_SMOKE)
    out = run_pipeline(docs, derive_entities(), concurrency=8)
    return out["clusters"]


def _q_er_mentions_by_surface(sf_dir: str):
    """Mention extraction (M2/M8 + S4 explode) aggregated per surface form —
    DuckDB-checkable because the interleave derivation preserves tokens."""
    import pyarrow as pa

    import ray

    from entity_linking_ray.stages.mentions import extract_mentions
    from entity_linking_ray.testdata import ALIAS_WORDS, derive_documents
    from ray.data.aggregate import Sum

    docs = derive_documents(sf_dir)
    mentions = extract_mentions(docs, ALIAS_WORDS, concurrency=8)

    def partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select(["norm_mention"]).group_by("norm_mention")
            .aggregate([("norm_mention", "count")]).rename_columns(["mention", "n"])
        )

    return (
        mentions.map_batches(partial, batch_format="pyarrow")
        .groupby("mention")
        .aggregate(Sum("n", alias_name="n"))
    )


# Shared-subplan memo: several battery queries are different PROJECTIONS
# of one pipeline configuration (links vs clusters of the same run). The
# pipeline's pin="links" materialization is the barrier, so sharing the
# run dict within a process lets the second consumer reuse the
# materialized front instead of rebuilding it — common-subplan reuse,
# not result caching: each query still projects and re-executes its own
# (immutable) output, and every entry stays oracle-checked. Keyed by
# (config, sf_dir); only identical-configuration twins share a key.
_RUN_MEMO: dict = {}


def _memo_run(key: tuple, build: Callable[[], Any]) -> Any:
    out = _RUN_MEMO.get(key)
    if out is None:
        out = _RUN_MEMO[key] = build()
    return out


def _default_run(sf_dir: str):
    from entity_linking_ray.pipelines.link_and_cluster import run_pipeline
    from entity_linking_ray.testdata import derive_documents, derive_entities

    return _memo_run(("default", sf_dir), lambda: run_pipeline(
        derive_documents(sf_dir), derive_entities(), concurrency=8))


def _q_er_links(sf_dir: str):
    """Flagship links table under the DEFAULT calibrated scorer (rows-only:
    model-scored; the er_links_exact twin value-hash-checks the same path
    under the deterministic configuration)."""
    return _default_run(sf_dir)["links"]


def _q_er_clusters(sf_dir: str):
    """Flagship clusters under the default scorer (rows-only; the
    er_clusters_exact twin is the value-hash check of the same path).
    Shares _default_run's materialized front with er_links."""
    return _default_run(sf_dir)["clusters"]


def _run_exact_pipeline(sf_dir: str):
    """The flagship under its deterministic SQL-expressible configuration:
    exact-alias channel only (ann_k=0), strsim-only scoring
    (score_weights=(1,0) — the swap-protocol hook), salting off. Every
    exact candidate ties at score 1.0, so the link IS the stable
    (score desc, entity_id asc) tie-break — the determinism hard-part of
    SURVEY.md §7 — and the 63-bit node/label hashes become reproducible
    in DuckDB (entity_linking_ray/oracles.py emulates the mod-2^64
    arithmetic via HUGEINT partials).

    ALL FIVE exact projections (links, clusters, mentions, scored_pairs,
    annotated) share ONE memoized run with pin="scored": the expensive
    front (extract → candidates → score) materializes once and every
    projection — mentions drop-columns, the pairs explode, the links
    flat map, clustering, the broadcast annotate — derives from the
    pinned table. Common-subplan reuse, not result caching: each query
    still projects and executes its own output, and every entry stays
    independently oracle-checked. The eager broadcast-annotate
    aggregation is included because the battery consumes it anyway and
    it derives from pinned scored (one cheap flat map + groupby), no
    longer a second front pass."""
    from entity_linking_ray.pipelines.link_and_cluster import run_pipeline
    from entity_linking_ray.testdata import derive_documents, derive_entities

    def build():
        return run_pipeline(
            derive_documents(sf_dir), derive_entities(), concurrency=8,
            ann_k=0, score_weights=(1.0, 0.0), threshold=0.9,
            hot_cap=1 << 40, pin="scored", annotate="broadcast")

    return _memo_run(("exact-scored", sf_dir), build)


def _q_er_links_exact(sf_dir: str):
    """Value-hash-oracled flagship links (exact channel, deterministic
    scorer): checks mention extraction (span_idx/offset through the
    interleave's media-span shifts), candidate tie-break, and the
    mention node hash bit-for-bit against DuckDB."""
    return _run_exact_pipeline(sf_dir)["links"]


def _q_er_clusters_exact(sf_dir: str):
    """Value-hash-oracled flagship clusters: degree-1 transitive
    clustering labels (min of anchor/mention node hashes) checked
    bit-for-bit against DuckDB."""
    return _run_exact_pipeline(sf_dir)["clusters"]


def _q_er_mentions_exact(sf_dir: str):
    """Value-hash-oracled flagship MENTIONS table: surface, normalized
    surface, char offsets AND the ±120-char context windows (the M5
    context builder) checked against a DuckDB reconstruction of the
    span chunking. Projects off the shared pin="scored" run."""
    return _run_exact_pipeline(sf_dir)["mentions"]


def _q_er_annotated_exact(sf_dir: str):
    """Value-hash-oracled ANNOTATED_DOCUMENTS projection: per-doc
    mention/link counts from the broadcast-searchsorted attach (the
    spans column — byte-identical pass-through, property-tested — is
    projected off because list<struct> has no canonical SQL form)."""
    out = _run_exact_pipeline(sf_dir)["annotated_documents"]
    return out.select_columns(["doc_id", "n_mentions", "n_linked"])


def _q_er_scored_pairs_exact(sf_dir: str):
    """Value-hash-oracled flagship SCORED_PAIRS (the nested-candidates
    explode, stages/pairwise.explode_scored_pairs): every exact candidate
    with its tie-break rank, checked against the full alias→entity map
    and a per-mention row_number in DuckDB. Projects off the shared
    pin="scored" run."""
    return _run_exact_pipeline(sf_dir)["scored_pairs"]


def _run_incremental_halves(sf_dir: str, **kw):
    """Shared scaffold for the incremental battery queries: deterministic
    doc_id-hash halves; the archive (half 0) contributes only its
    per-entity monoid state + clusters table, the front runs on the
    increment (half 1) alone. ``kw`` forwards the channel configuration
    to both runs (run_pipeline_incremental)."""
    import pyarrow as pa

    from entity_linking_ray.functions.hashing import hash_strings
    from entity_linking_ray.pipelines.link_and_cluster import (
        run_pipeline_incremental)
    from entity_linking_ray.testdata import derive_documents, derive_entities

    docs = derive_documents(sf_dir)

    def half(par: int):
        def f(b: pa.Table) -> pa.Table:
            h = hash_strings(b["doc_id"].to_pylist()) % 2
            return b.filter(pa.array(h == par))
        return f

    ents = derive_entities()
    first = run_pipeline_incremental(
        docs.map_batches(half(0), batch_format="pyarrow"), ents,
        concurrency=8, **kw)
    second = run_pipeline_incremental(
        docs.map_batches(half(1), batch_format="pyarrow"), ents,
        concurrency=8, prior_state=first["state"],
        prior_clusters=first["clusters"].materialize(), **kw)
    return second["clusters"]


def _q_er_clusters_incremental_exact(sf_dir: str):
    """The INCREMENTAL ingestion path under the deterministic exact-channel
    configuration. Oracled with the SAME DuckDB SQL as er_clusters_exact —
    a value-hash proof that incremental ≡ full-run clustering (the pytest
    equivalence gate, now driver-checked)."""
    return _run_incremental_halves(
        sf_dir, ann_k=0, score_weights=(1.0, 0.0), threshold=0.9,
        hot_cap=1 << 40)


def _q_er_clusters_incremental(sf_dir: str):
    """Flagship clusters produced INCREMENTALLY under the DEFAULT scorer
    (rows-only; the _exact twin is the value-hash check, and equality
    with the full run is pinned by tests/test_incremental.py)."""
    return _run_incremental_halves(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from entity_linking_ray import queries as q

    out = {
        "er_mentions_by_surface": _q_er_mentions_by_surface,
        "er_links": _q_er_links,
        "er_clusters": _q_er_clusters,
        "er_links_exact": _q_er_links_exact,
        "er_clusters_exact": _q_er_clusters_exact,
        "er_mentions_exact": _q_er_mentions_exact,
        "er_annotated_exact": _q_er_annotated_exact,
        "er_scored_pairs_exact": _q_er_scored_pairs_exact,
        "er_clusters_incremental": _q_er_clusters_incremental,
        "er_clusters_incremental_exact": _q_er_clusters_incremental_exact,
    }
    out.update(q.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from entity_linking_ray import queries as q

    alias_list = ", ".join(
        f"'{w}'" for w in ["spark", "customer", "vector", "stream", "window", "query", "merge", "hash"]
    )
    from entity_linking_ray.oracles import er_exact_sql

    out = {
        "er_mentions_by_surface": f"""
            SELECT tok AS mention, count(*) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
            WHERE tok IN ({alias_list})
            GROUP BY tok
        """,
        "er_links_exact": er_exact_sql("links"),
        "er_clusters_exact": er_exact_sql("clusters"),
        "er_mentions_exact": er_exact_sql("mentions"),
        "er_annotated_exact": er_exact_sql("annotated"),
        "er_scored_pairs_exact": er_exact_sql("pairs"),
        "er_clusters_incremental_exact": er_exact_sql("clusters"),
    }
    out.update(q.ORACLE_SQL)
    return out
