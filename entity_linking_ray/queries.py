"""Operator-coverage queries over the driver testdata tables, with DuckDB
oracle SQL (the driver's correctness harness runs both at sf0.01).

Each entry exercises operators from SURVEY.md §2 re-expressed Ray-Data
first. Computed/aggregate column names match the SQL exactly (the driver
hashes values after sorting columns by name).

Registry shape: QUERIES[name] = callable(sf_dir) → Dataset/Table;
ORACLE_SQL[name] = ANSI SQL over the pre-registered views. Names absent
from ORACLE_SQL get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Relational operator coverage (filters / groupby-agg / join / sort / limit —
# SURVEY.md §2.5-2.6 analogues, exercised on the TPC-H-ish tables)
# ---------------------------------------------------------------------------


@register(
    "lineitem_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 3)                                  AS sum_qty,
           round(sum(l_extendedprice), 3)                             AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 3)          AS sum_disc_price,
           count(*)                                                   AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def _q_pricing(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate: vectorized filter + derived column
    in Arrow map_batches, per-batch partial aggregation before the shuffle
    (the combiner pattern), small final groupby."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        import datetime

        cutoff = pa.scalar(datetime.datetime(1998, 9, 2), pa.timestamp("us"))
        b = b.filter(pc.less_equal(b["l_shipdate"], cutoff))
        disc = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({
            "l_returnflag": b["l_returnflag"], "l_linestatus": b["l_linestatus"],
            "l_quantity": b["l_quantity"], "l_extendedprice": b["l_extendedprice"],
            "disc_price": disc,
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"], "l_linestatus": b["l_linestatus"],
            "sum_qty": pc.round(b["sum_qty"], 3),
            "sum_base_price": pc.round(b["sum_base_price"], 3),
            "sum_disc_price": pc.round(b["sum_disc_price"], 3),
            "count_order": b["count_order"],
        })

    return agg.map_batches(fin, batch_format="pyarrow")


@register(
    "top_customers_by_revenue",
    """
    SELECT c_custkey, c_name, round(sum(o_totalprice), 3) AS revenue,
           count(*) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def _q_top_customers(sf_dir: str):
    """Hash join (orders ⋈ customer) + groupby + global top-k. The small
    side (customer) broadcasts implicitly through the hash join."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders")
    )
    joined = per_cust.join(customer, "inner", 8, on=("o_custkey",), right_on=("c_custkey",))

    def fin(b: pa.Table) -> pa.Table:
        # the join emits the left key column (o_custkey); the right key is
        # consumed by the join itself
        key = b["c_custkey"] if "c_custkey" in b.schema.names else b["o_custkey"]
        return pa.table({
            "c_custkey": key, "c_name": b["c_name"],
            "revenue": pc.round(b["revenue"], 3), "n_orders": b["n_orders"],
        })

    return joined.map_batches(fin, batch_format="pyarrow").sort(
        ["revenue", "c_custkey"], descending=[True, False]
    ).limit(10)


@register(
    "part_link_boost",
    """
    SELECT p.p_partkey, count(*) AS n_lines,
           round(ln(1 + count(*)), 6) AS boost
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey
    """,
)
def _q_part_boost(sf_dir: str):
    """G1 incoming-link count + log boost (enrich_data.py:79-164 /
    main_solr.py:139-143 analogue): per-batch partial counts → small
    groupby → semi-join against the part keys."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_partkey"])

    def partial(b: pa.Table) -> pa.Table:
        return (
            b.group_by("l_partkey").aggregate([("l_partkey", "count")])
            .rename_columns(["l_partkey", "n"])
        )

    counts = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey").aggregate(Sum("n", alias_name="n_lines"))
    )
    part_keys = set(
        _read(sf_dir, "part", ["p_partkey"]).to_pandas()["p_partkey"].tolist()
    )
    keys_ref = ray.put(part_keys)

    def fin(b: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = pa.array([k in keys for k in b["l_partkey"].to_pylist()])
        b = b.filter(mask)
        boost = pc.round(pc.ln(pc.add(pc.cast(b["n_lines"], pa.float64()), 1.0)), 6)
        return pa.table({
            "p_partkey": b["l_partkey"], "n_lines": b["n_lines"], "boost": boost,
        })

    return counts.map_batches(fin, batch_format="pyarrow")


@register(
    "events_hourly",
    """
    SELECT event_type, date_trunc('hour', ts) AS hour,
           count(*) AS n, round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY event_type, hour
    """,
)
def _q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate over the event stream (streaming-shaped
    workload → groupby(key, window-bucket), ray_guide.md pattern)."""
    import pandas as pd

    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["hour"] = df["ts"].dt.floor("h")
        return df[["event_type", "hour", "value"]]

    agg = (
        ev.map_batches(bucket, batch_format="pandas")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value"].round(6)
        return df

    return agg.map_batches(fin, batch_format="pandas")


# ---------------------------------------------------------------------------
# Text-analysis suite over documents (token counting / quality / word freq)
# ---------------------------------------------------------------------------


@register(
    "doc_token_stats",
    """
    SELECT doc_id,
           length(text) AS n_chars_calc,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
    """,
)
def _q_token_stats(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        return pa.table({
            "doc_id": b["doc_id"],
            "n_chars_calc": pc.cast(pc.utf8_length(b["text"]), pa.int64()),
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


@register(
    "word_freq_top20",
    """
    SELECT tok AS word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def _q_word_freq(sf_dir: str):
    """Token explode + count: per-batch partial counts (combiner) before
    the shuffle — the canonical pre-aggregation pattern."""
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])

    def partial(b: pa.Table) -> pa.Table:
        s = pd.Series([t for txt in b["text"].to_pylist() for t in txt.split(" ")])
        vc = s.value_counts()
        return pa.table({"word": pa.array(vc.index.tolist(), pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word").aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(20)
    )


@register(
    "lang_profile",
    """
    SELECT lang, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def _q_lang_profile(sf_dir: str):
    import pandas as pd

    from ray.data.aggregate import Count, Mean

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    agg = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars")
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_chars"] = df["avg_chars"].round(6)
        return df

    return agg.map_batches(fin, batch_format="pandas")


@register(
    "docs_exact_dedup",
    """
    SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
    """,
)
def _q_exact_dedup(sf_dir: str):
    """Exact dedup via content hash (D1/D2 analogue at document scale):
    shuffle key is the 63-bit hash, winner is the min doc_id."""
    from .stages.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(ds, col="text", id_col="doc_id")


# ---------------------------------------------------------------------------
# Similarity search over the embeddings table
# ---------------------------------------------------------------------------


@register(
    "knn_top5",
    """
    SELECT qid AS query_id, nid AS neighbor_id, rnk - 1 AS rank
    FROM (
      SELECT a.vec_id AS qid, b.vec_id AS nid,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                        b.vec_id
             ) AS rnk
      FROM embeddings a, embeddings b
      WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    )
    WHERE rnk <= 5
    """,
)
def _q_knn(sf_dir: str):
    """Brute-force cosine top-k: broadcast query matrix, per-batch matmul
    partial top-k, per-query merge."""
    import numpy as np

    from .stages.knn import brute_force_knn

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = ds.filter(expr="vec_id < 10").to_pandas().sort_values("vec_id")
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"]])
    out = brute_force_knn(ds, Q, head["vec_id"].tolist(), k=5)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


# ---------------------------------------------------------------------------
# Rows-only checks (not SQL-expressible): dedup/near-dup, fingerprints,
# language-ID, quality ratios, multimodal features
# ---------------------------------------------------------------------------


@register("minhash_dup_pairs")
def _q_minhash_pairs(sf_dir: str):
    from .stages.dedup import lsh_candidate_pairs, minhash_band_rows

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return lsh_candidate_pairs(minhash_band_rows(ds), jaccard_threshold=0.6)


@register("simhash_fingerprints")
def _q_simhash(sf_dir: str):
    from .stages.dedup import simhash_fingerprints

    return simhash_fingerprints(_read(sf_dir, "documents", ["doc_id", "text"]))


@register("doc_quality_features")
def _q_quality(sf_dir: str):
    from .functions.textstats import quality_features

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: quality_features(b).drop_columns(["text"]), batch_format="pyarrow"
    )


@register("doc_language_id")
def _q_langid(sf_dir: str):
    import pyarrow as pa

    from .functions.textstats import detect_language_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def lid(b: pa.Table) -> pa.Table:
        pred = detect_language_batch(b["text"].to_pylist())
        return pa.table({
            "doc_id": b["doc_id"], "lang": b["lang"],
            "lang_pred": pa.array(list(pred), pa.string()),
        })

    return ds.map_batches(lid, batch_format="pyarrow")


@register("media_features")
def _q_media(sf_dir: str):
    from .stages.multimodal import extract_media_features
    from .testdata import derive_documents

    return extract_media_features(derive_documents(sf_dir), concurrency=2)


@register("embedding_dup_pairs")
def _q_embed_dups(sf_dir: str):
    from .stages.dedup import embedding_dup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_dup_pairs(ds, cosine_threshold=0.9)


# ---------------------------------------------------------------------------
# Additional relational coverage: multi-hop joins, distinct, min/max,
# filtered counts, top-k over events (SURVEY.md §2.4-2.6 parity)
# ---------------------------------------------------------------------------


@register(
    "revenue_by_region",
    """
    SELECT r.r_name AS region, round(sum(o.o_totalprice), 3) AS revenue,
           count(*) AS n_orders
    FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def _q_revenue_by_region(sf_dir: str):
    """Multi-hop dimension join: the nation→region chain is tiny, so it
    broadcasts as a dict (map-side join); only orders ⋈ customer shuffles —
    and customer is pre-collapsed to custkey→region driver-side because
    customer is a dimension table too. One groupby total."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from ray.data.aggregate import Count, Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nat_to_reg = dict(zip(nation.n_nationkey, nation.n_regionkey))
    reg_name = dict(zip(region.r_regionkey, region.r_name))
    cust_to_region = {
        ck: reg_name[nat_to_reg[nk]] for ck, nk in zip(cust.c_custkey, cust.c_nationkey)
    }
    lut_ref = ray.put(cust_to_region)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def tag(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        reg = [lut[k] for k in b["o_custkey"].to_pylist()]
        return pa.table({"region": pa.array(reg, pa.string()),
                         "o_totalprice": b["o_totalprice"]})

    agg = (
        orders.map_batches(tag, batch_format="pyarrow")
        .groupby("region")
        .aggregate(Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders"))
    )
    return agg.map_batches(
        lambda b: pa.table({"region": b["region"],
                            "revenue": pc.round(b["revenue"], 3),
                            "n_orders": b["n_orders"]}),
        batch_format="pyarrow",
    )


@register(
    "distinct_mktsegments",
    "SELECT DISTINCT c_mktsegment FROM customer",
)
def _q_distinct_segments(sf_dir: str):
    import pyarrow as pa

    vals = _read(sf_dir, "customer", ["c_mktsegment"]).unique("c_mktsegment")
    return pa.table({"c_mktsegment": pa.array(sorted(vals), pa.string())})


@register(
    "urgent_orders_by_status",
    """
    SELECT o_orderstatus, count(*) AS n
    FROM orders WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
)
def _q_urgent_orders(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
    return (
        ds.map_batches(
            lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT")),
            batch_format="pyarrow")
        .groupby("o_orderstatus").aggregate(Count(alias_name="n"))
        .select_columns(["o_orderstatus", "n"])
    )


@register(
    "supplier_balance_by_nation",
    """
    SELECT s_nationkey, round(min(s_acctbal), 3) AS min_bal,
           round(max(s_acctbal), 3) AS max_bal, count(*) AS n
    FROM supplier GROUP BY s_nationkey
    """,
)
def _q_supplier_balance(sf_dir: str):
    import pandas as pd

    from ray.data.aggregate import Count, Max, Min

    agg = (
        _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .groupby("s_nationkey")
        .aggregate(Min("s_acctbal", alias_name="min_bal"),
                   Max("s_acctbal", alias_name="max_bal"),
                   Count(alias_name="n"))
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["min_bal"] = df["min_bal"].round(3)
        df["max_bal"] = df["max_bal"].round(3)
        return df

    return agg.map_batches(fin, batch_format="pandas")


@register(
    "top_users_by_event_value",
    """
    SELECT user_id, round(sum(value), 6) AS total_value, count(*) AS n_events
    FROM events GROUP BY user_id
    ORDER BY total_value DESC, user_id LIMIT 5
    """,
)
def _q_top_users(sf_dir: str):
    import pandas as pd

    from ray.data.aggregate import Count, Sum

    agg = (
        _read(sf_dir, "events", ["user_id", "value"])
        .groupby("user_id")
        .aggregate(Sum("value", alias_name="total_value"), Count(alias_name="n_events"))
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["total_value"] = df["total_value"].round(6)
        return df

    return (
        agg.map_batches(fin, batch_format="pandas")
        .sort(["total_value", "user_id"], descending=[True, False])
        .limit(5)
    )


@register(
    "part_type_stats",
    """
    SELECT p_type, count(*) AS n, round(avg(p_retailprice), 6) AS avg_price
    FROM part GROUP BY p_type
    """,
)
def _q_part_type(sf_dir: str):
    import pandas as pd

    from ray.data.aggregate import Count, Mean

    agg = (
        _read(sf_dir, "part", ["p_type", "p_retailprice"])
        .groupby("p_type")
        .aggregate(Count(alias_name="n"), Mean("p_retailprice", alias_name="avg_price"))
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_price"] = df["avg_price"].round(6)
        return df

    return agg.map_batches(fin, batch_format="pandas")


@register("entity_descriptions")
def _q_entity_descriptions(sf_dir: str):
    """Description synthesis M7 over the derived KB (rows-only: the KB is
    engine-derived, not a registered view)."""
    import ray.data

    from .stages.alias_index import add_description
    from .testdata import derive_entities

    return ray.data.from_arrow(derive_entities()).map_batches(
        add_description, batch_format="pyarrow"
    ).select_columns(["entity_id", "subject", "description"])


@register("doc_fingerprints")
def _q_doc_fingerprints(sf_dir: str):
    """Winnowing-style rolling-hash document fingerprints (rows-only)."""
    import pyarrow as pa

    from .functions.textstats import rolling_fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        vals = [rolling_fingerprint(t) & 0x7FFFFFFFFFFFFFFF for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"], "fingerprint": pa.array(vals, pa.int64())})

    return ds.map_batches(fp, batch_format="pyarrow")


@register("knn_ivf_top5")
def _q_knn_ivf(sf_dir: str):
    """IVF bucket-pruned ANN variant (rows-only: approximate by design;
    exactness is covered by knn_top5's oracle)."""
    import numpy as np

    from .stages.knn import ivf_knn

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = ds.filter(expr="vec_id < 10").to_pandas().sort_values("vec_id")
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"]])
    out = ivf_knn(ds, Q, head["vec_id"].tolist(), k=5, n_centroids=16, nprobe=4)
    return out.select_columns(["query_id", "neighbor_id", "rank"])
