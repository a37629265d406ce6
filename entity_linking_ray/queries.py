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


def _table_partitions(sf_dir: str, *tables: str,
                      bytes_per_partition: int = 64 << 20,
                      lo: int = 2, hi: int = 1024) -> int:
    """Join/repartition width derived from the on-disk bytes of the
    driving tables — scales with SF instead of a fixed literal (which is
    a width bottleneck at 100×), and costs nothing (no count() execution;
    the run_pipeline row-count derivation needs a materialized dataset)."""
    import glob
    import os

    total = 0
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            total += sum(os.path.getsize(f)
                         for f in glob.glob(f"{p}/**", recursive=True)
                         if os.path.isfile(f))
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return int(max(lo, min(hi, total // bytes_per_partition + lo)))


# ---------------------------------------------------------------------------
# Relational operator coverage (filters / groupby-agg / join / sort / limit —
# SURVEY.md §2.5-2.6 analogues, exercised on the TPC-H-ish tables)
# ---------------------------------------------------------------------------


@register(
    "lineitem_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(cast(round(l_quantity * 100) as bigint)) / 100.0            AS sum_qty,
           sum(cast(round(l_extendedprice * 100) as bigint)) / 100.0       AS sum_base_price,
           (sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) as bigint)) + 5)
             // 10 / 1000.0                                                AS sum_disc_price,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def _q_pricing(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate: vectorized filter + derived column
    in Arrow map_batches, per-batch partial aggregation before the shuffle
    (the combiner pattern), small final groupby.

    Money columns are aggregated in FIXED-POINT int64 (cents; disc_price in
    1e-4 units since price and discount each carry 2 decimals) so the
    distributed sum is order-independent — float64 accumulation order
    differs across partitionings and flipped a round(,3) boundary cell vs
    the oracle in round 1. TPC-H itself types these columns DECIMAL; the
    oracle SQL uses the identical fixed-point formulation, so both sides
    compute the same exact integer before the final decimal conversion
    (half-up at the 1e-3 boundary, done in integer space)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def _fx(arr, scale: float) -> pa.Array:
        # per-row float ops are order-independent; ties-away-from-zero
        # matches DuckDB round()
        return pc.cast(
            pc.round(pc.multiply(arr, scale), round_mode="half_towards_infinity"),
            pa.int64(),
        )

    def prep(b: pa.Table) -> pa.Table:
        import datetime

        cutoff = pa.scalar(datetime.datetime(1998, 9, 2), pa.timestamp("us"))
        b = b.filter(pc.less_equal(b["l_shipdate"], cutoff))
        disc = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({
            "l_returnflag": b["l_returnflag"], "l_linestatus": b["l_linestatus"],
            "qty_fx": _fx(b["l_quantity"], 100.0),
            "price_fx": _fx(b["l_extendedprice"], 100.0),
            "disc_fx": _fx(disc, 10000.0),
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_fx", alias_name="sum_qty_fx"),
            Sum("price_fx", alias_name="sum_price_fx"),
            Sum("disc_fx", alias_name="sum_disc_fx"),
            Count(alias_name="count_order"),
        )
    )

    def fin(b: pa.Table) -> pa.Table:
        as_f64 = lambda a: pc.cast(a, pa.float64())
        # disc: 1e-4 units → half-up to 1e-3 units in integer space, then
        # one exact int→float division (identical op in the oracle SQL)
        disc3 = pc.divide(pc.add(b["sum_disc_fx"], 5), 10)
        return pa.table({
            "l_returnflag": b["l_returnflag"], "l_linestatus": b["l_linestatus"],
            "sum_qty": pc.divide(as_f64(b["sum_qty_fx"]), 100.0),
            "sum_base_price": pc.divide(as_f64(b["sum_price_fx"]), 100.0),
            "sum_disc_price": pc.divide(as_f64(disc3), 1000.0),
            "count_order": b["count_order"],
        })

    return agg.map_batches(fin, batch_format="pyarrow")


@register(
    "top_customers_by_revenue",
    """
    SELECT c_custkey, c_name,
           sum(cast(round(o_totalprice * 100) as bigint)) / 100.0 AS revenue,
           count(*) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def _q_top_customers(sf_dir: str):
    """Hash join (orders ⋈ customer) + groupby + global top-k. The small
    side (customer) broadcasts implicitly through the hash join. Revenue
    sums in fixed-point cents (order-independent, see pricing summary)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "price_fx": pc.cast(
                pc.round(pc.multiply(b["o_totalprice"], 100.0),
                         round_mode="half_towards_infinity"),
                pa.int64()),
        })

    def combine(b: pa.Table) -> pa.Table:
        # batch-local combiner: ≤ one row per (batch, custkey)
        return (b.group_by("o_custkey")
                .aggregate([("price_fx", "sum"), ("price_fx", "count")])
                .rename_columns(["o_custkey", "sum_fx", "n_orders"]))

    # join the batch partials DIRECTLY, aggregate after: the join shuffle
    # already co-locates by custkey, so a global per-custkey groupby
    # before it (plus the untyped-empty-block scrub repartition a
    # groupby→join needs on Ray 2.49) would be two extra all-to-alls
    per_cust = (orders.map_batches(prep, batch_format="pyarrow")
                .map_batches(combine, batch_format="pyarrow"))
    np_ = _table_partitions(sf_dir, "orders", "customer")
    joined = per_cust.join(
        customer, "inner", np_, on=("o_custkey",), right_on=("c_custkey",))
    from .stages.agg import bucketed_agg

    per_cust_tot = bucketed_agg(
        joined, ["o_custkey", "c_name"],
        [("sum_fx", "sum", "sum_fx"), ("n_orders", "sum", "n_orders")])

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["o_custkey"], "c_name": b["c_name"],
            "revenue": pc.divide(pc.cast(b["sum_fx"], pa.float64()), 100.0),
            "n_orders": b["n_orders"],
        })

    return per_cust_tot.map_batches(fin, batch_format="pyarrow").sort(
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

    # part SCALES with SF → semi-join as a distributed hash join (no
    # driver-side key set); at 100 TB both sides shuffle by partkey only.
    # Batch partials join DIRECTLY and the per-key sum runs AFTER the
    # join — a global pre-join groupby (plus the untyped-empty-block
    # scrub repartition a groupby→join needs on Ray 2.49) would be two
    # extra all-to-alls for the same result
    part = _read(sf_dir, "part", ["p_partkey"])
    np_ = _table_partitions(sf_dir, "lineitem", "part")
    joined = li.map_batches(partial, batch_format="pyarrow").join(
        part, "inner", np_, on=("l_partkey",), right_on=("p_partkey",))
    # bucketed sum: partkey cardinality scales with SF and Ray's native
    # per-key aggregate costs ~5 s at 20k keys (stages/agg.py)
    from .stages.agg import bucketed_agg

    counts = bucketed_agg(joined, "l_partkey",
                          [("n", "sum", "n_lines")])

    def fin(b: pa.Table) -> pa.Table:
        boost = pc.round(pc.ln(pc.add(pc.cast(b["n_lines"], pa.float64()), 1.0)), 6,
                         round_mode="half_towards_infinity")
        return pa.table({
            "p_partkey": b["l_partkey"], "n_lines": b["n_lines"], "boost": boost,
        })

    return counts.map_batches(fin, batch_format="pyarrow")


@register(
    "events_hourly",
    """
    SELECT event_type, date_trunc('hour', ts) AS hour,
           count(*) AS n,
           sum(cast(round(value * 1000000) as bigint)) / 1000000.0 AS sum_value
    FROM events
    GROUP BY event_type, hour
    """,
)
def _q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate over the event stream (streaming-shaped
    workload → groupby(key, window-bucket), ray_guide.md pattern).

    The bucket stage is pyarrow (zero-copy pre-shuffle — no pandas
    conversion upstream of the exchange) and ``value`` is summed in
    fixed-point micro-units so the distributed sum is order-independent
    (same formulation in the oracle SQL)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def bucket(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "hour": pc.floor_temporal(b["ts"], unit="hour"),
            "value_fx": pc.cast(
                pc.round(pc.multiply(b["value"], 1_000_000.0),
                         round_mode="half_towards_infinity"),
                pa.int64()),
        })

    agg = (
        ev.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value_fx", alias_name="sum_fx"))
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"], "hour": b["hour"], "n": b["n"],
            "sum_value": pc.divide(pc.cast(b["sum_fx"], pa.float64()), 1_000_000.0),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


@register(
    "events_sliding_1h",
    """
    SELECT ws AS window_start, count(*) AS n_events,
           cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
    FROM (
      SELECT ((epoch_us(ts) // 900000000) - i.range) * 900000000 AS ws, value
      FROM events, range(4) i
    )
    GROUP BY ws
    """,
)
def _q_events_sliding(sf_dir: str):
    """Sliding-window aggregate (1 h windows every 15 min): each event
    explodes into its 4 covering windows WITH a per-batch combiner, so the
    shuffle moves (window, partial) rows, not events; integer-only output
    (epoch-us starts, counts, fixed-point cents) for hash stability."""
    from .stages.windows import sliding_window_agg

    ev = _read(sf_dir, "events", ["ts", "value"])
    return sliding_window_agg(ev, width_us=3_600_000_000, slide_us=900_000_000)


@register(
    "events_sliding_distinct_users",
    """
    SELECT ws AS window_start,
           cast(count(distinct user_id) as bigint) AS n_users
    FROM (
      SELECT ((epoch_us(ts) // 900000000) - i.range) * 900000000 AS ws,
             user_id
      FROM events, range(4) i
    )
    GROUP BY ws
    """,
)
def _q_events_sliding_distinct(sf_dir: str):
    """Sliding-window COUNT DISTINCT (1 h windows every 15 min): the
    window explode happens per batch WITH an in-batch (window, user)
    dedup combiner, then bucketed_agg dedups globally (bucket hash on
    the high-cardinality user), and a partial-count combiner + tiny
    window-keyed groupby sums per window — users explode ×4 only as
    pre-deduped partial rows, never as raw events."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .stages.agg import bucketed_agg

    ev = _read(sf_dir, "events", ["ts", "user_id"])
    slide = 900_000_000
    nwin = 4

    def explode(b: pa.Table) -> pa.Table:
        tcol = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        t = tcol.to_numpy(zero_copy_only=False)
        u = b["user_id"].to_numpy(zero_copy_only=False)
        # pc.divide truncates toward zero like DuckDB's // — numpy's
        # floor-dividing t // slide would diverge on pre-1970 timestamps
        base = pc.divide(tcol, slide).to_numpy(zero_copy_only=False)
        ws = ((np.repeat(base, nwin)
               - np.tile(np.arange(nwin, dtype=np.int64), len(t)))
              * slide)
        t2 = pa.table({"user_id": pa.array(np.repeat(u, nwin)),
                       "ws": pa.array(ws, pa.int64())})
        return (t2.group_by(["user_id", "ws"]).aggregate([])
                .rename_columns(["user_id", "ws"]))

    pairs = bucketed_agg(ev.map_batches(explode, batch_format="pyarrow"),
                         ["user_id", "ws"])

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["ws"]).aggregate([([], "count_all")])
        return g.rename_columns(["ws", "__c"])

    out = (pairs.map_batches(count_partial, batch_format="pyarrow")
           .groupby("ws").aggregate(Sum("__c", alias_name="n_users")))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"window_start": b["ws"],
                         "n_users": pc.cast(b["n_users"], pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow")


@register(
    "event_value_rank_in_type",
    """
    WITH e AS (SELECT event_id, event_type,
                      cast(round(value * 100) as bigint) AS cents
               FROM events)
    SELECT event_id, event_type, cents,
           cast(rank() OVER (PARTITION BY event_type
                             ORDER BY cents DESC) as bigint) AS rnk
    FROM e
    """,
)
def _q_event_value_rank_in_type(sf_dir: str):
    """SQL RANK() with ties, distributively: rank of an event within its
    type = 1 + (count of strictly greater values), so the engine builds
    the per-(type, cents) count histogram (bucketed_agg — the only
    shuffle, bounded by distinct values × types, never events), ranks
    histogram rows per type with an exclusive cumsum, and broadcasts the
    (type, cents) → rank table into a map over the raw events. Events
    themselves never shuffle — the 100-TB-safe window-rank plan."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from .stages.agg import bucketed_agg

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"], "cents": cents})

    evp = ev.map_batches(prep, batch_format="pyarrow").materialize()
    hist = bucketed_agg(evp, ["cents", "event_type"],
                        [("cents", "count", "n")])

    def rank_rows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "cents"],
                          ascending=[True, False], kind="mergesort")
        types = g["event_type"].to_numpy()
        n = g["n"].to_numpy(np.int64)
        start = np.zeros(len(g), bool)
        if len(g):
            start[0] = True
            start[1:] = types[1:] != types[:-1]
        run = np.cumsum(n) - n  # global exclusive cumsum
        base = run[start][np.cumsum(start) - 1]  # reset per type
        return pd.DataFrame({"event_type": types, "cents": g["cents"],
                             "rnk": run - base + 1})

    # one row per (type, distinct value): bounded by value cardinality,
    # small enough to rank in one task and broadcast as sorted arrays
    # keyed EXACTLY by (type index, cents) — no hash-collision surface
    rt = rank_rows(hist.to_pandas())
    type_idx = {t: i for i, t in enumerate(sorted(set(rt["event_type"])))}
    T = max(len(type_idx), 1)
    key = (rt["cents"].to_numpy(np.int64) * T
           + np.array([type_idx[t] for t in rt["event_type"]], np.int64))
    order = np.argsort(key)
    lut = ray.put((key[order], rt["rnk"].to_numpy(np.int64)[order],
                   type_idx))

    def attach(b: pa.Table) -> pa.Table:
        k, r, tix = ray.get(lut)
        bk = (b["cents"].to_numpy(zero_copy_only=False) * len(tix)
              + np.array([tix[t] for t in b["event_type"].to_pylist()],
                         np.int64))
        pos = np.searchsorted(k, bk)
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"],
                         "cents": b["cents"],
                         "rnk": pa.array(r[pos], pa.int64())})

    return evp.map_batches(attach, batch_format="pyarrow")


@register(
    "user_sessions",
    """
    SELECT user_id, min(t) AS session_start, count(*) AS n_events,
           max(t) - min(t) AS duration_us
    FROM (
      SELECT user_id, t,
             sum(brk) OVER (PARTITION BY user_id ORDER BY t
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM (
        SELECT user_id, t,
               CASE WHEN prev IS NULL OR t - prev > 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM (
          SELECT user_id, epoch_us(ts) AS t,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts)) AS prev
          FROM events
        )
      )
    )
    GROUP BY user_id, sess
    """,
)
def _q_user_sessions(sf_dir: str):
    """Session windows (30 min gap) per user, via the SALTED two-phase
    plan (pre-segment in (user, 6h-bucket) groups, merge boundary
    sessions per user over summaries — stages/windows.py), so the oracle
    validates the hot-key path end-to-end. Equal timestamps land in one
    session regardless of tie order → deterministic vs the oracle's
    window-function formulation."""
    from .stages.windows import session_windows

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return session_windows(ev, gap_us=1_800_000_000,
                           salt_bucket_us=21_600_000_000)


@register(
    "error_prev_click_asof",
    """
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS t,
           cast(coalesce(epoch_us(r.ts), -1) as bigint) AS asof_t
    FROM (SELECT * FROM events WHERE event_type = 'error') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def _q_asof(sf_dir: str):
    """Backward as-of join: every error event gets the latest prior click
    timestamp of the same user, checked against DuckDB's native ASOF
    JOIN. Runs the SALTED two-phase plan (stages/joins.py — (user,
    1h-bucket) co-groups + summary fallback), so the oracle validates the
    hot-key path end-to-end. Emitting the matched timestamp keeps
    boundary ties deterministic on both sides."""
    from .stages.joins import asof_join_latest

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    left = ev.filter(expr="event_type == 'error'")
    right = ev.filter(expr="event_type == 'click'")
    return asof_join_latest(left, right, key="user_id", ts="ts",
                            left_id="event_id",
                            salt_bucket_us=3_600_000_000)


@register(
    "error_click_range_count",
    """
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS t,
           cast(count(r.event_id) as bigint) AS n_in_range
    FROM (SELECT * FROM events WHERE event_type = 'error') l
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id
     AND epoch_us(r.ts) BETWEEN epoch_us(l.ts) - 600000000
                            AND epoch_us(l.ts) + 600000000
    GROUP BY l.event_id, l.user_id, t
    """,
)
def _q_range_count(sf_dir: str):
    """Range join (count form): clicks within ±10 min of each error by the
    same user — two searchsorted probes per group, no pair
    materialization (the scale-safe formulation; exploding pairs is what
    makes naive range joins quadratic). Runs the SALTED plan (1h buckets,
    right rows replicate ~1.33×), so the oracle validates the hot-key
    path end-to-end."""
    from .stages.joins import range_join_count

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    left = ev.filter(expr="event_type == 'error'")
    right = ev.filter(expr="event_type == 'click'")
    return range_join_count(left, right, key="user_id", ts="ts",
                            left_id="event_id",
                            before_us=600_000_000, after_us=600_000_000,
                            salt_bucket_us=3_600_000_000)


@register(
    "orders_status_pivot",
    """
    SELECT o_orderpriority,
           cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                as bigint) AS n_f,
           cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                as bigint) AS n_o,
           cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                as bigint) AS n_p,
           cast(sum(cast(round(o_totalprice * 100) as bigint))
                as bigint) AS total_units
    FROM orders GROUP BY o_orderpriority
    """,
)
def _q_status_pivot(sf_dir: str):
    """Pivot / conditional aggregation: per-priority counts fanned out by
    status into columns, plus a fixed-point price sum. The whole pivot is
    a per-block Arrow kernel (flag columns + group_by partials) feeding
    one tiny groupby-sum — shuffle rows = priorities × blocks."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders",
                   ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        units = pc.cast(pc.round(
            pc.multiply(pc.cast(b["o_totalprice"], pa.float64()),
                        pa.scalar(100.0)),
            round_mode="half_towards_infinity"), pa.int64())
        flags = pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "n_f": pc.cast(pc.equal(b["o_orderstatus"], "F"), pa.int64()),
            "n_o": pc.cast(pc.equal(b["o_orderstatus"], "O"), pa.int64()),
            "n_p": pc.cast(pc.equal(b["o_orderstatus"], "P"), pa.int64()),
            "total_units": units,
        })
        g = flags.group_by(["o_orderpriority"]).aggregate(
            [("n_f", "sum"), ("n_o", "sum"), ("n_p", "sum"),
             ("total_units", "sum")])
        return g.rename_columns(
            ["o_orderpriority", "n_f", "n_o", "n_p", "total_units"])

    return (orders.map_batches(part, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("n_f", alias_name="n_f"),
                       Sum("n_o", alias_name="n_o"),
                       Sum("n_p", alias_name="n_p"),
                       Sum("total_units", alias_name="total_units")))


@register(
    "event_value_lag_delta",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             cast(round(value * 100) as bigint) AS value_units
      FROM events),
    l AS (
      SELECT user_id, event_id, t, value_units,
             lag(value_units) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id) AS prev_units
      FROM e)
    SELECT user_id, event_id, t, value_units,
           cast(prev_units as bigint) AS prev_units,
           cast(value_units - prev_units as bigint) AS delta_units
    FROM l WHERE prev_units IS NOT NULL
    """,
)
def _q_lag_delta(sf_dir: str):
    """Per-user lag/delta (SQL lag() window semantics, ties broken by
    event_id; first event per user dropped — its lag is NULL). Values in
    cents fixed-point so the delta is integer-exact against the oracle.
    One groupby(user) shuffle, vectorized shift per group."""
    from .stages.windows import grouped_lag_delta

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return grouped_lag_delta(ev, key_col="user_id", ts_col="ts",
                             id_col="event_id", val_col="value")


@register(
    "doc_tfidf_top3",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             round(tf.tf * ln(cast(n.n as double) / df.df), 6) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rk
      FROM scored)
    SELECT doc_id, cast(rk as bigint) AS rn, term, score,
           cast(tf as bigint) AS tf, cast(df as bigint) AS df
    FROM ranked WHERE rk <= 3
    """,
)
def _q_tfidf(sf_dir: str):
    """TF-IDF keyword extraction: top-3 terms per document by
    round(tf·ln(N/df), 6) — per-batch Arrow tf explode, bucketed df sum,
    one tf⋈df hash join on the term, grouped top-N finish. Same rounded-
    ln float surface the part_link_boost oracle proved hash-stable."""
    from .stages.tfidf import tfidf_top_terms

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_top_terms(ds, id_col="doc_id", col="text", k=3,
                           num_partitions=_table_partitions(
                               sf_dir, "documents"))


@register(
    "event_running_totals",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             cast(round(value * 100) as bigint) AS value_units
      FROM events)
    SELECT user_id, event_id, t, value_units,
           cast(sum(value_units) OVER (
                PARTITION BY user_id ORDER BY t, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                as bigint) AS run_units,
           cast(count(*) OVER (
                PARTITION BY user_id ORDER BY t, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                as bigint) AS run_n
    FROM e
    """,
)
def _q_running_totals(sf_dir: str):
    """Expanding-window running totals per user (SQL sum()/count() OVER
    with full tie-break). One groupby(user) shuffle, vectorized cumsum
    per group; cents fixed-point so the hash check is exact."""
    from .stages.windows import grouped_running_sum

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return grouped_running_sum(ev, key_col="user_id", ts_col="ts",
                               id_col="event_id", val_col="value")


@register(
    "event_value_quantiles",
    """
    SELECT event_type,
           cast(count(*) as bigint) AS n,
           cast(quantile_disc(cast(round(value * 100) as bigint), 0.50)
                as bigint) AS p50_units,
           cast(quantile_disc(cast(round(value * 100) as bigint), 0.95)
                as bigint) AS p95_units,
           cast(quantile_disc(cast(round(value * 100) as bigint), 0.99)
                as bigint) AS p99_units
    FROM events GROUP BY event_type
    """,
)
def _q_event_quantiles(sf_dir: str):
    """EXACT per-type p50/p95/p99 of event value via the distributed
    count-histogram (stages/rank.py): per-block Arrow group_by partials →
    one groupby over (type, cents, count) rows → integer-rank cumsum.
    quantile_disc semantics (value at rank ceil(q*n)); cents fixed-point
    on both sides so no float-sum hash drift. Shuffle volume is distinct
    cents × blocks per type, independent of row count."""
    from .stages.rank import grouped_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantiles(ev, key_col="event_type", val_col="value",
                             qs_pct=(50, 95, 99))


@register(
    "event_value_quantiles_cont",
    """
    WITH e AS (SELECT event_type,
                      cast(round(value * 100) as bigint) AS cents
               FROM events)
    SELECT event_type, cast(count(*) as bigint) AS n,
           quantile_cont(cents, 0.25) AS p25_cont,
           quantile_cont(cents, 0.50) AS p50_cont,
           quantile_cont(cents, 0.75) AS p75_cont
    FROM e GROUP BY event_type
    """,
)
def _q_event_quantiles_cont(sf_dir: str):
    """INTERPOLATED per-type quartiles (SQL quantile_cont /
    percentile_cont): the same distributed count-histogram plan as
    event_value_quantiles, finalized at rank q·(n−1) with linear
    interpolation (stages/rank.grouped_quantiles_cont). The percentile
    set is restricted to quarter fractions, where integer cents make
    every float64 intermediate EXACT — so this float-valued output is
    value-hash-stable against DuckDB regardless of its interpolation
    formula variant (other percentiles are refused loudly)."""
    from .stages.rank import grouped_quantiles_cont

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantiles_cont(ev, key_col="event_type",
                                  val_col="value", qs_pct=(25, 50, 75))


@register(
    "top_orders_per_priority",
    """
    SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             cast(row_number() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey ASC)
                  as bigint) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def _q_top_orders(sf_dir: str):
    """Grouped top-N (row_number semantics, ties broken by o_orderkey):
    per-block combiner keeps ≤ N rows per key, so the shuffle carries
    ≤ N × blocks rows per key — the shape that survives a skewed 100-TB
    key where a global sort or full-group collect would not."""
    from .stages.rank import topn_per_group

    orders = _read(sf_dir, "orders",
                   ["o_orderpriority", "o_orderkey", "o_totalprice"])
    return topn_per_group(orders, key_col="o_orderpriority",
                          order_col="o_totalprice", id_col="o_orderkey", n=3)


@register(
    "distinct_users_by_type",
    """
    SELECT event_type, cast(count(distinct user_id) as bigint) AS n_users
    FROM events GROUP BY event_type
    """,
)
def _q_distinct_users(sf_dir: str):
    """Exact COUNT DISTINCT per group: bucketed_agg's internal per-block
    combiner collapses (user, type) pairs before its user-hashed bucket
    shuffle dedups globally, then a partial-count combiner + tiny
    groupby sums per type."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "__c"])

    from .stages.agg import bucketed_agg

    # user_id first: it is the high-cardinality key, so the bucket hash
    # spreads over all 64 buckets instead of the ~5 event types (the
    # skew caveat in agg.py). bucketed_agg's internal partial IS the
    # per-batch distinct combiner — no separate pre-pass needed.
    pairs = bucketed_agg(ev, ["user_id", "event_type"])
    return (pairs.map_batches(count_partial, batch_format="pyarrow")
            .groupby("event_type").aggregate(Sum("__c", alias_name="n_users")))


@register(
    "doc_pack_bins",
    """
    WITH t AS (
      SELECT doc_id,
             cast(len(string_split(text, ' ')) as bigint) AS n_tokens
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_tokens,
             cast(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) as bigint) AS cum_tokens
      FROM t
    )
    SELECT doc_id, n_tokens, cum_tokens,
           cast((cum_tokens - n_tokens) // 2048 as bigint) AS bin_id
    FROM s
    """,
)
def _q_pack_bins(sf_dir: str):
    """Sequence packing for training: documents packed into 2048-token
    bins in doc_id order via the distributed prefix-scan
    (stages/scan.py — range-bucketed two-phase cumsum; only O(buckets)
    totals touch the driver). bin_id = exclusive-prefix // capacity, so
    the SQL window formulation verifies it exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.scan import pack_by_token_budget

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def toks(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pc.cast(pc.list_value_length(
                pc.split_pattern(b["text"], " ")), pa.int64()),
        })

    counted = ds.map_batches(toks, batch_format="pyarrow")
    return pack_by_token_budget(counted, order_col="doc_id",
                                tokens_col="n_tokens", capacity=2048)


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
    the shuffle — the canonical pre-aggregation pattern. The combiner is
    pure Arrow kernels (split_pattern → list_flatten → group_by count),
    no Python token loop."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])

    from .stages.agg import bucketed_agg

    def explode(b: pa.Table) -> pa.Table:
        return pa.table({"word": pc.list_flatten(
            pc.split_pattern(b["text"], " "))})

    return (
        bucketed_agg(ds.map_batches(explode, batch_format="pyarrow"),
                     "word", [("word", "count", "n")])
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
    """Mean computed as exact int64 Sum / Count (order-independent), with
    the final round in ties-away-from-zero mode to match DuckDB round()."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    agg = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )

    def fin(b: pa.Table) -> pa.Table:
        avg = pc.divide(pc.cast(b["sum_chars"], pa.float64()),
                        pc.cast(b["n_docs"], pa.float64()))
        return pa.table({
            "lang": b["lang"], "n_docs": b["n_docs"],
            "avg_chars": pc.round(avg, 6, round_mode="half_towards_infinity"),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


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
# Dedup / fingerprints / text-quality / multimodal family. Most carry full
# value-hash oracles; the few outputs with no SQL-exact form (64-bit hash
# streams, DEFLATE sizes, feature vectors) stay rows-only WITH a pinned or
# metadata companion oracle beside them (see *_pinned / media_spans_meta).
# ---------------------------------------------------------------------------


@register(
    "minhash_dup_pairs",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([(hash(substring(text, i, 5)) & 9223372036854775807)::BIGINT
                            FOR i IN range(1, length(text) - 3)]) AS s
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s)) >= 0.6 * len(list_distinct(a.s || b.s))
    """,
)
def _q_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-dup pair mining, oracled against the EXACT 5-gram
    Jaccard self-join (the LSH estimate must recover exactly the true
    pair set — the testdata's planted near-dups sit at J >= 0.92 vs a
    background max of 0.31, far from the 0.6 threshold, and the banding
    recall at J ~ 0.95 is 1 - 1e-9). The signature-estimated jaccard
    column is available from lsh_candidate_pairs for non-oracled use."""
    import pyarrow as pa

    from .stages.dedup import lsh_candidate_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = lsh_candidate_pairs(ds, jaccard_threshold=0.6)
    return pairs.map_batches(
        lambda b: pa.table({"id_a": b["id_a"], "id_b": b["id_b"]}),
        batch_format="pyarrow",
    )


@register(
    "docs_near_dedup_keep",
    """
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct([(hash(substring(text, i, 5)) & 9223372036854775807)::BIGINT
                            FOR i IN range(1, length(text) - 3)]) AS s
      FROM documents
    ),
    p AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s)) >= 0.6 * len(list_distinct(a.s || b.s))
    ),
    eu AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
    rr(a, b) AS (
      SELECT a, a FROM eu
      UNION
      SELECT rr.a, eu.b FROM rr JOIN eu ON rr.b = eu.a),
    losers AS (SELECT a AS doc_id FROM rr GROUP BY a HAVING min(b) < a)
    SELECT d.doc_id, d.n_chars FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
    """,
)
def _q_docs_near_dedup_keep(sf_dir: str):
    """END-TO-END MinHash near-dup removal (stages/dedup.minhash_dedup:
    LSH pairs → connected components → keep each dup cluster's min-id
    representative) — the keep-set twin of minhash_dup_pairs, mirroring
    embeddings_semdedup_keep for the text channel. The oracle re-derives
    the keep set from the EXACT 5-gram Jaccard pair set plus a
    recursive-CTE closure with the same min-id winner rule (the planted
    near-dups sit far from the 0.6 threshold, so LSH pair recovery is
    exact — see minhash_dup_pairs). winner_mode="auto" resolves to the
    broadcast path at this pair count; the keyed-join 100-TB path is
    equivalence-tested in tests/test_dedup.py."""
    import pyarrow as pa

    from .stages.dedup import minhash_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    keep = minhash_dedup(ds, jaccard_threshold=0.6)
    return keep.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "n_chars": b["n_chars"]}),
        batch_format="pyarrow",
    )


@register(
    "jaccard_dup_pairs",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            FOR i IN range(1, len(w) - 1)]) AS s
      FROM w
      WHERE len(w) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.s, b.s)) AS n_inter,
           len(list_distinct(a.s || b.s)) AS n_union
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s)) >= 0.7 * len(list_distinct(a.s || b.s))
    """,
)
def _q_jaccard_pairs(sf_dir: str):
    """EXACT word-trigram Jaccard near-dup pairs via df-ordered prefix
    filtering (All-Pairs blocking — recall 1 at the threshold by the
    prefix lemma, no LSH estimate anywhere). The oracle is the
    brute-force exact Jaccard self-join over the same word trigrams; the
    Ray side must produce the identical pair set AND the identical
    integer intersect/union counts (shingle-set cardinalities are
    hash-invariant: the oracle intersects gram STRINGS, the engine
    63-bit gram hashes)."""
    from .stages.dedup import ngram_jaccard_dup_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_dup_pairs(ds, threshold=0.7)


def _digest_sql() -> str:
    from .oracles import fnv1a_sql

    return f"""
    SELECT cast(count(*) as bigint) AS n_rows,
           cast(((sum(h >> 31) * 2147483648 + sum(h & 2147483647))
                 % 9223372036854775808) as bigint) AS digest
    FROM (SELECT CAST({fnv1a_sql("CAST(doc_id AS VARCHAR) || '|' || text")}
                      & 9223372036854775807 AS BIGINT) AS h
          FROM documents)
    """


@register("docs_table_digest", _digest_sql())
def _q_docs_table_digest(sf_dir: str):
    """Order/partition-independent corpus checksum
    (stages/sketch.table_digest): Σ fnv1a64(doc_id|text) mod 2^63 over
    every document, reduced to one (n_rows, digest) row — the
    replication / snapshot-restore / migration verification primitive.
    Commutative addition makes the digest identical under ANY block
    layout; the oracle replays the byte-exact FNV loop (oracles.py) and
    the 31-bit limb algebra in HUGEINT."""
    from .stages.sketch import table_digest

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return table_digest(docs, cols=["doc_id", "text"])


@register("simhash_fingerprints")
def _q_simhash(sf_dir: str):
    from .stages.dedup import simhash_fingerprints

    return simhash_fingerprints(_read(sf_dir, "documents", ["doc_id", "text"]))


def _quality_sql() -> str:
    from .functions.textstats import STOPWORD_PATTERN

    return f"""
    SELECT doc_id,
           length(text) AS n_chars_calc,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           length(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) AS n_alpha,
           len(regexp_extract_all(text, '{STOPWORD_PATTERN}')) AS n_stop
    FROM documents
    """


@register("doc_quality_features", _quality_sql())
def _q_quality(sf_dir: str):
    """Quality heuristics as exact integer COUNTS (char/token/alpha/
    stopword) — SQL-checkable with no float-rounding surface; the derived
    ratios remain on quality_features for pipeline use."""
    from .functions.textstats import quality_features

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: quality_features(b).select(
            ["doc_id", "n_chars_calc", "n_tokens", "n_alpha", "n_stop"]),
        batch_format="pyarrow",
    )


def _langid_sql() -> str:
    from .functions.textstats import STOPWORDS

    def in_list(lang: str) -> str:
        return ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang]))

    # replicates detect_language exactly: CJK char ratio > 0.2 → zh
    # (integer cross-multiply — same classification as the float ratio);
    # else strict-argmax stopword hits in profile order en,fr,es,de
    # (earlier language wins ties); no tokens or no hits → und
    return f"""
    SELECT doc_id, lang,
      CASE
        WHEN 5 * length(regexp_replace(text,
             '[^\\x{{4E00}}-\\x{{9FFF}}\\x{{3400}}-\\x{{4DBF}}\\x{{3040}}-\\x{{30FF}}]',
             '', 'g')) > length(text) THEN 'zh'
        WHEN en > 0 AND en >= fr AND en >= es AND en >= de THEN 'en'
        WHEN fr > 0 AND fr >  en AND fr >= es AND fr >= de THEN 'fr'
        WHEN es > 0 AND es >  en AND es >  fr AND es >= de THEN 'es'
        WHEN de > 0 AND de >  en AND de >  fr AND de >  es THEN 'de'
        ELSE 'und'
      END AS lang_pred
    FROM (
      SELECT doc_id, lang, text,
        len(list_filter(toks, x -> x IN ({in_list('en')}))) AS en,
        len(list_filter(toks, x -> x IN ({in_list('fr')}))) AS fr,
        len(list_filter(toks, x -> x IN ({in_list('es')}))) AS es,
        len(list_filter(toks, x -> x IN ({in_list('de')}))) AS de
      FROM (
        SELECT doc_id, lang, text,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '') AS toks
        FROM documents
      )
    )
    """


@register("doc_language_id", _langid_sql())
def _q_langid(sf_dir: str):
    """Rule-based language ID (CJK ratio + stopword-profile argmax) —
    deterministic enough to replicate as a SQL CASE oracle."""
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


@register(
    "doc_bigram_novelty",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    big AS (
      SELECT DISTINCT doc_id, bg FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(l)),
                      j -> l[j] || ' ' || l[j + 1])) AS bg
        FROM docs WHERE len(l) >= 2)
    ),
    dfs AS (SELECT bg, count(*) AS df FROM big GROUP BY bg)
    SELECT b.doc_id,
           cast(count(*) AS bigint) AS n_bigrams,
           cast(sum(d.df) AS bigint) AS df_sum,
           cast(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS bigint)
               AS unique_bigrams
    FROM big b JOIN dfs d USING (bg)
    GROUP BY b.doc_id
    """,
)
def _q_doc_bigram_novelty(sf_dir: str):
    """CCNet-style rare-n-gram novelty: per doc, the distinct-bigram
    count, the summed corpus document-frequency of those bigrams and the
    count unique to the doc (stages/tfidf.bigram_novelty — two-pass
    explode → bucketed df → one hash join, all-integer so the oracle is
    value-hash exact)."""
    from .stages.tfidf import bigram_novelty

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return bigram_novelty(docs)


@register(
    "docs_containment_pairs",
    """
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(list_slice(l, 1, len(l) // 2), ' ') AS text
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
      WHERE doc_id < 10 AND len(l) // 2 >= 8
    ),
    elig AS (
      SELECT doc_id, text FROM aug
      WHERE len(string_split(text, ' ')) >= 8
    )
    SELECT a.doc_id AS id_contained, b.doc_id AS id_container
    FROM elig a JOIN elig b ON a.doc_id <> b.doc_id
    -- contains() is a LITERAL substring test (LIKE would treat %/_ in
    -- document text as wildcards and over-match vs the engine's check)
    WHERE contains(' ' || b.text || ' ', ' ' || a.text || ' ')
    """,
)
def _q_docs_containment(sf_dir: str):
    """Token-sequence containment dedup (stages/dedup.containment_pairs):
    the testdata has no natural containment pairs, so ten truncated
    copies are planted (doc_id < 10 re-emitted as id+1e6 with the first
    half of their tokens — the same augmentation expressed in the oracle,
    which brute-forces ALL pairs). The distributed path must find every
    pair, planted or chance, via the min-window-hash probe — candidate
    recall is exact by the winnowing argument, so the value-hash match
    proves both the candidate and verify stages."""
    import pyarrow as pa

    from .stages.dedup import containment_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def aug(b: pa.Table) -> pa.Table:
        ids, txts = [], []
        for did, tx in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            ids.append(did); txts.append(tx)
            toks = tx.split(" ") if tx else []
            if did < 10 and len(toks) // 2 >= 8:
                ids.append(did + 1_000_000)
                txts.append(" ".join(toks[:len(toks) // 2]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(txts, pa.string())})

    return containment_pairs(docs.map_batches(aug, batch_format="pyarrow"))


def _split_sql() -> str:
    from .oracles import MASK63, fnv1a_sql

    return f"""
    SELECT doc_id,
           CASE WHEN ({fnv1a_sql("CAST(doc_id AS VARCHAR)")} & {MASK63})
                     % 100 < 30
                THEN 'test' ELSE 'train' END AS split
    FROM documents
    """


@register("doc_split_assignment", _split_sql())
def _q_doc_split(sf_dir: str):
    """Deterministic hash-bucket train/test holdout (M16's scale variant,
    pipelines/train_prep.hash_split): assignment is a pure row function
    of the key — no shuffle, resume-stable, leakage-free by key, and
    incremental batches agree with a full run. Value-hash oracled via
    the FNV-1a SQL replica (oracles.py)."""
    from .pipelines.train_prep import hash_split

    docs = _read(sf_dir, "documents", ["doc_id"])
    return hash_split(docs, "doc_id")


def _media_meta_sql() -> str:
    """DuckDB replica of the interleave's media-span injection
    (testdata.interleave_batch): a media span after every 3rd text chunk,
    gated by bit (fnv1a(doc_id) >> (chunk % 32)) & 1; kind selected by
    (h >> 8) % 3; span_idx shifted by the count of earlier media spans."""
    from .oracles import fnv1a_sql

    return f"""
    WITH docs AS (
      SELECT doc_id AS did, printf('doc-%08d', doc_id) AS doc_id,
             {fnv1a_sql("CAST(doc_id AS VARCHAR)")} AS h,
             CASE WHEN text = '' THEN 0 ELSE len(string_split(text, ' ')) END AS ntok
      FROM documents
    ),
    media AS (
      SELECT did, doc_id, h,
             unnest(range(3, CAST((ntok + 11) // 12 AS BIGINT) + 1, 3)) AS m
      FROM docs
    )
    SELECT doc_id,
           CAST(m + len(list_filter(range(3, CAST(m AS BIGINT) - 2, 3),
                    mm -> (h >> (mm % 32)) & 1 = 1)) AS INT) AS span_idx,
           CASE CAST((h >> 8) % 3 AS INT)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'table' END AS kind,
           'media://' || CAST(did AS VARCHAR) || '/' || CAST(m AS VARCHAR) AS media_ref
    FROM media
    WHERE (h >> (m % 32)) & 1 = 1
    """


@register("media_spans_meta", _media_meta_sql())
def _q_media_meta(sf_dir: str):
    """The media-feature extractor's METADATA projection, value-hash
    oracled: runs the same distributed actor-pool extractor as
    media_features (span explode, kind/ref plumbing) and drops only the
    feature vector (the fake-decoder embedding, which stays rows-only by
    nature in media_features)."""
    from .stages.multimodal import extract_media_features
    from .testdata import derive_documents

    return extract_media_features(derive_documents(sf_dir), concurrency=2)\
        .select_columns(["doc_id", "span_idx", "kind", "media_ref"])


@register(
    "embedding_dup_pairs",
    """
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 10
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    """,
)
def _q_embed_dups(sf_dir: str):
    """SRP-LSH near-dup pairs, fully oracle-checked: the testdata contains
    NO natural pairs above cosine 0.95 (measured max off-diagonal 0.51),
    so the input is augmented with ten EXACT duplicate vectors (vec_id <
    10 re-emitted as vec_id + 1e6 — the same augmentation expressed in the
    oracle SQL). Identical vectors share every SRP band by construction,
    so the banding recall on them is exactly 1.0 and the result is
    deterministic: the ten planted (i, i+1e6) pairs and nothing else.
    General-position near-dup recall is covered by the planted-perturbation
    fixture in tests/test_dedup.py. Only the id pair is emitted (the
    cosine column would hash float-fragile)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.dedup import embedding_dup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def augment(b: pa.Table) -> pa.Table:
        keep = pc.less(b["vec_id"], 10)
        dup = b.filter(keep)
        dup = dup.set_column(0, "vec_id", pc.add(dup["vec_id"], 1_000_000))
        return pa.concat_tables([b, dup])

    aug = ds.map_batches(augment, batch_format="pyarrow")
    pairs = embedding_dup_pairs(aug, cosine_threshold=0.95)
    return pairs.map_batches(
        lambda b: pa.table({"id_a": b["id_a"], "id_b": b["id_b"]}),
        batch_format="pyarrow")


@register(
    "embedding_sim_pairs",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
    """,
)
def _q_embed_sim_pairs(sf_dir: str):
    """EXACT cosine similarity self-join above a threshold, as a FULLY
    DISTRIBUTED triangle tile join (stages/knn.py::cosine_self_join): no
    driver-side collect of the embedding table — rows replicate to their
    O(num_tiles) tile-pair groups and each group does one tile×tile
    matmul, every pair computed exactly once. The brute-force baseline
    the LSH variants approximate — oracled against DuckDB's
    list_cosine_similarity cross join. Threshold 0.45 sits in a wide
    margin of the testdata's cosine distribution (nearest values ~0.449 /
    0.452), so float32-vs-float64 kernel differences cannot flip a pair."""
    import pyarrow as pa

    from .stages.knn import cosine_self_join

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = cosine_self_join(ds, threshold=0.45, num_tiles=4)
    return out.map_batches(lambda b: b.select(["id_a", "id_b"]),
                           batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Additional relational coverage: multi-hop joins, distinct, min/max,
# filtered counts, top-k over events (SURVEY.md §2.4-2.6 parity)
# ---------------------------------------------------------------------------


@register(
    "revenue_by_region",
    """
    SELECT r.r_name AS region,
           sum(cast(round(o.o_totalprice * 100) as bigint)) / 100.0 AS revenue,
           count(*) AS n_orders
    FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def _q_revenue_by_region(sf_dir: str):
    """Multi-hop dimension join. Only nation→region (≤ a few hundred rows
    at ANY scale factor) broadcasts as a dict; customer SCALES with SF, so
    orders ⋈ customer runs as a real distributed hash join — no driver
    materialization of an SF-scaled table. Orders are pre-aggregated per
    custkey (combiner) before the join, so the shuffle moves one row per
    customer, not one per order. Fixed-point cents for the sum."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from ray.data.aggregate import Count, Sum

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    reg_name = dict(zip(region.r_regionkey, region.r_name))
    nat_to_name = {nk: reg_name[rk] for nk, rk in zip(nation.n_nationkey, nation.n_regionkey)}
    lut_ref = ray.put(nat_to_name)

    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def tag_customer(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        # vectorized map via dictionary-encode over the tiny nation key set
        dct = pc.dictionary_encode(b["c_nationkey"].combine_chunks())
        names = [lut[nk] for nk in dct.dictionary.to_pylist()]
        reg = pc.take(pa.array(names, pa.string()), dct.indices)
        return pa.table({"c_custkey": b["c_custkey"], "region": reg})

    cust_region = customer.map_batches(tag_customer, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        fx = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], 100.0),
                     round_mode="half_towards_infinity"),
            pa.int64())
        return (
            pa.table({"o_custkey": b["o_custkey"], "fx": fx, "one": fx})
            .group_by("o_custkey")
            .aggregate([("fx", "sum"), ("one", "count")])
            .rename_columns(["o_custkey", "fx_sum", "n"])
        )

    # batch-local partials join DIRECTLY (several rows per custkey are
    # fine — the final region groupby sums them): a global per-custkey
    # aggregate before the join would be a second all-to-all that buys
    # nothing, since the join shuffle already co-locates by custkey and
    # partial rows are at most one per (batch, custkey)
    per_cust = orders.map_batches(prep, batch_format="pyarrow")
    np_ = _table_partitions(sf_dir, "orders", "customer")
    joined = per_cust.join(cust_region, "inner", np_,
                           on=("o_custkey",), right_on=("c_custkey",))
    agg = joined.groupby("region").aggregate(
        Sum("fx_sum", alias_name="sum_fx"), Sum("n", alias_name="n_orders")
    )
    return agg.map_batches(
        lambda b: pa.table({
            "region": b["region"],
            "revenue": pc.divide(pc.cast(b["sum_fx"], pa.float64()), 100.0),
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

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])

    def part(b: pa.Table) -> pa.Table:
        # filter + batch-local count combiner: ≤ one row per status per
        # batch rides the shuffle, never the filtered orders
        f = b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
        return (f.group_by("o_orderstatus")
                .aggregate([("o_orderstatus", "count")])
                .rename_columns(["o_orderstatus", "__c"]))

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("o_orderstatus").aggregate(Sum("__c", alias_name="n"))
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
    """Min/Max are order-independent; only the final round needs the
    DuckDB-matching ties-away mode."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Max, Min

    agg = (
        _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .groupby("s_nationkey")
        .aggregate(Min("s_acctbal", alias_name="min_bal"),
                   Max("s_acctbal", alias_name="max_bal"),
                   Count(alias_name="n"))
    )

    def fin(b: pa.Table) -> pa.Table:
        rnd = lambda a: pc.round(a, 3, round_mode="half_towards_infinity")
        return pa.table({
            "s_nationkey": b["s_nationkey"], "min_bal": rnd(b["min_bal"]),
            "max_bal": rnd(b["max_bal"]), "n": b["n"],
        })

    return agg.map_batches(fin, batch_format="pyarrow")


@register(
    "top_users_by_event_value",
    """
    SELECT user_id,
           sum(cast(round(value * 1000000) as bigint)) / 1000000.0 AS total_value,
           count(*) AS n_events
    FROM events GROUP BY user_id
    ORDER BY total_value DESC, user_id LIMIT 5
    """,
)
def _q_top_users(sf_dir: str):
    """Top-k by grouped sum — fixed-point micro-units for an
    order-independent distributed sum (see events_hourly)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        # batch-local combiner: the shuffle moves one row per
        # (batch, user), never the raw events
        t = pa.table({
            "user_id": b["user_id"],
            "value_fx": pc.cast(
                pc.round(pc.multiply(b["value"], 1_000_000.0),
                         round_mode="half_towards_infinity"),
                pa.int64()),
        })
        return (t.group_by("user_id")
                .aggregate([("value_fx", "sum"), ("value_fx", "count")])
                .rename_columns(["user_id", "sum_fx", "n"]))

    agg = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("sum_fx", alias_name="sum_fx"),
                   Sum("n", alias_name="n_events"))
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "total_value": pc.divide(pc.cast(b["sum_fx"], pa.float64()), 1_000_000.0),
            "n_events": b["n_events"],
        })

    return (
        agg.map_batches(fin, batch_format="pyarrow")
        .sort(["total_value", "user_id"], descending=[True, False])
        .limit(5)
    )


@register(
    "part_type_stats",
    """
    SELECT p_type, count(*) AS n,
           round(sum(cast(round(p_retailprice * 100) as bigint)) / 100.0 / count(*), 6)
             AS avg_price
    FROM part GROUP BY p_type
    """,
)
def _q_part_type(sf_dir: str):
    """avg over a money column via exact fixed-point Sum / Count (the float
    Mean accumulates in nondeterministic order); ties-away round matches
    DuckDB."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "part", ["p_type", "p_retailprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_type": b["p_type"],
            "price_fx": pc.cast(
                pc.round(pc.multiply(b["p_retailprice"], 100.0),
                         round_mode="half_towards_infinity"),
                pa.int64()),
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("p_type")
        .aggregate(Count(alias_name="n"), Sum("price_fx", alias_name="sum_fx"))
    )

    def fin(b: pa.Table) -> pa.Table:
        avg = pc.divide(
            pc.divide(pc.cast(b["sum_fx"], pa.float64()), 100.0),
            pc.cast(b["n"], pa.float64()),
        )
        return pa.table({
            "p_type": b["p_type"], "n": b["n"],
            "avg_price": pc.round(avg, 6, round_mode="half_towards_infinity"),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


@register(
    "entity_descriptions",
    """
    SELECT * FROM (VALUES
        ('T00000', 'spark 0',    'profile，batch line scan the。'),
        ('T00001', 'spark 1',    'profile，fast line part row。'),
        ('T00002', 'customer 0', 'profile，filter line row scan the。'),
        ('T00003', 'customer 1', 'profile，column fast part row the。'),
        ('T00004', 'vector 0',   'profile，a big data dup。'),
        ('T00005', 'stream 0',   'profile，key line scan slow。'),
        ('T00006', 'stream 1',   'profile，a fast join row。'),
        ('T00007', 'stream 2',   'profile，column filter scan small。'),
        ('T00008', 'window 0',   'profile，filter line row scan small。'),
        ('T00009', 'query 0',    'profile，agg batch group order slow。'),
        ('T00010', 'query 1',    'profile，a agg batch line order。'),
        ('T00011', 'merge 0',    'profile，batch dup fast group slow。'),
        ('T00012', 'hash 0',     'profile，big data dup row table。'),
        ('T00013', 'hash 1',     'profile，big column group table value。')
    ) AS v(entity_id, subject, description)
    """,
)
def _q_entity_descriptions(sf_dir: str):
    """Description synthesis M7 over the derived KB. The KB is a fixed
    deterministic constant (independent of sf — testdata.derive_entities
    seeds from the alias vocabulary only), so the oracle pins all 14 rows
    as VALUES literals: any change to the M7 synthesis rules (char budget,
    separator, sort — functions/describe.py) breaks the value-hash."""
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


@register(
    "knn_ivf_top5",
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
def _q_knn_ivf(sf_dir: str):
    """IVF k-NN with nprobe == n_centroids: probing EVERY coarse bucket
    must reproduce the exact brute-force answer, so the whole IVF dataflow
    (distributed centroid sampling → bucket assignment → bucket-masked
    partial top-k → per-query merge) is hash-checked against the same
    DuckDB oracle as knn_top5. Pruned-nprobe recall (the approximate
    operating point) is covered by pytest."""
    import numpy as np

    from .stages.knn import ivf_knn

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = ds.filter(expr="vec_id < 10").to_pandas().sort_values("vec_id")
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"]])
    out = ivf_knn(ds, Q, head["vec_id"].tolist(), k=5, n_centroids=16, nprobe=16)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


# ---------------------------------------------------------------------------
# Round-3 additions: existence joins, bounded window frames, rollup,
# distributed moments, histogram, deterministic sampling, sketches
# ---------------------------------------------------------------------------


@register(
    "customers_without_urgent_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def _q_customers_without_urgent(sf_dir: str):
    """Left-anti existence join (SQL NOT EXISTS): the probe side is
    filtered at the read then reduced to one distinct-key marker row per
    customer before the hash join, so the shuffle moves key rows only
    (stages/joins.py ``anti_join``). The URGENT filter keeps the result
    non-empty at every test SF (an all-empty result would drop its
    schema through the driver's pandas conversion)."""
    from .stages.joins import anti_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = (_read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
              .filter(expr="o_orderpriority == '1-URGENT'")
              .select_columns(["o_custkey"]))
    nparts = _table_partitions(sf_dir, "customer", "orders")
    return anti_join(cust, orders, on=("c_custkey",),
                     right_on=("o_custkey",), num_partitions=nparts)


@register(
    "event_rolling_window",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             cast(round(value * 100) as bigint) AS value_units
      FROM events)
    SELECT user_id, event_id, t, value_units,
           cast(sum(value_units) OVER (
                PARTITION BY user_id ORDER BY t, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                as bigint) AS win_units,
           cast(count(*) OVER (
                PARTITION BY user_id ORDER BY t, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                as bigint) AS win_n
    FROM e
    """,
)
def _q_rolling_window(sf_dir: str):
    """Bounded ROWS frame (4-row rolling sum/count per user): segmented
    rolling sum via one cumsum per coarse key-hash bucket — completes
    the window-frame family (lag / expanding / bounded / sliding-time /
    session)."""
    from .stages.windows import grouped_rolling_window

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return grouped_rolling_window(ev, key_col="user_id", ts_col="ts",
                                  id_col="event_id", val_col="value",
                                  window_rows=4)


@register(
    "user_first_last_event",
    """
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, event_type
               FROM events),
    f AS (SELECT user_id, event_type AS first_type FROM e
          QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY t, event_id) = 1),
    l AS (SELECT user_id, event_type AS last_type,
                 cast(count(*) OVER (PARTITION BY user_id) as bigint)
                   AS n_events
          FROM e
          QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY t DESC, event_id DESC) = 1)
    SELECT f.user_id, first_type, last_type, n_events
    FROM f JOIN l USING (user_id)
    """,
)
def _q_first_last(sf_dir: str):
    """Distributed argmin/argmax-by-time: each batch reduces to one
    (key, first, last, n) partial per key before the shuffle
    (stages/windows.py ``grouped_first_last``) — the event payload never
    moves, only per-batch boundary rows."""
    import pyarrow as pa

    from .stages.windows import grouped_first_last

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    out = grouped_first_last(ev, key_col="user_id", ts_col="ts",
                             id_col="event_id", val_col="event_type")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "first_type": b["first_val"],
                         "last_type": b["last_val"],
                         "n_events": b["n_events"]})

    return out.map_batches(rename, batch_format="pyarrow")


@register(
    "events_ohlc_5min",
    """
    WITH e AS (SELECT event_type,
                      (epoch_us(ts) // 300000000) * 300000000 AS w,
                      cast(round(value * 100) as bigint) AS cents,
                      epoch_us(ts) AS t, event_id
               FROM events),
    r AS (SELECT *,
                 row_number() OVER (PARTITION BY event_type, w
                                    ORDER BY t, event_id) AS rf,
                 row_number() OVER (PARTITION BY event_type, w
                                    ORDER BY t DESC, event_id DESC) AS rl
          FROM e)
    SELECT event_type, w,
           cast(max(CASE WHEN rf = 1 THEN cents END) as bigint) AS open,
           cast(max(cents) as bigint) AS high,
           cast(min(cents) as bigint) AS low,
           cast(max(CASE WHEN rl = 1 THEN cents END) as bigint) AS close,
           count(*) AS n_events
    FROM r GROUP BY event_type, w
    """,
)
def _q_events_ohlc_5min(sf_dir: str):
    """OHLC downsampling (the candlestick / telemetry rollup): per
    (event_type, 5-minute window) the first/max/min/last value under the
    total (ts, event_id) order, in fixed-point cents. Rides
    stages/windows.grouped_ohlc — the multi-key two-level combiner:
    every batch collapses to one partial per (type, window) it touches
    (run-boundary picks + reduceat extrema), so the shuffle moves
    partials, never events."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.windows import grouped_ohlc

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        w = pc.multiply(pc.divide(t, 300_000_000), 300_000_000)
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({"event_type": b["event_type"], "w": w,
                         "ts": b["ts"], "event_id": b["event_id"],
                         "cents": cents})

    return grouped_ohlc(ev.map_batches(prep, batch_format="pyarrow"),
                        key_cols=["event_type", "w"], ts_col="ts",
                        id_col="event_id", val_col="cents")


@register(
    "event_value_histogram",
    """
    SELECT cast(floor(value / 5.0) as bigint) AS bin,
           count(*) AS n,
           cast(sum(cast(round(value * 100) as bigint)) as bigint)
             AS sum_units
    FROM events GROUP BY bin
    """,
)
def _q_value_histogram(sf_dir: str):
    """Fixed-width histogram: pure combiner shape (per-batch Arrow
    group_by partials, one tiny bin-keyed shuffle). Bin ids are exact
    (floor of a float divide is reproducible), sums fixed-point."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["value"])

    def part(b: pa.Table) -> pa.Table:
        binid = pc.cast(pc.floor(pc.divide(b["value"], 5.0)), pa.int64())
        units = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        t = pa.table({"bin": binid, "n": pa.repeat(pa.scalar(1, pa.int64()),
                                                   b.num_rows),
                      "sum_units": units})
        return (t.group_by("bin")
                .aggregate([("n", "sum"), ("sum_units", "sum")])
                .rename_columns(["bin", "n", "sum_units"]))

    return (ev.map_batches(part, batch_format="pyarrow")
            .groupby("bin").aggregate(Sum("n", alias_name="n"),
                                      Sum("sum_units",
                                          alias_name="sum_units")))


@register(
    "event_corr_moments",
    """
    WITH e AS (SELECT event_type,
                      cast(round(value * 100) as bigint) AS x,
                      cast(hour(ts) as bigint) AS y
               FROM events)
    SELECT event_type, count(*) AS n,
           cast(sum(x) as bigint)     AS sum_x,
           cast(sum(y) as bigint)     AS sum_y,
           cast(sum(x * y) as bigint) AS sum_xy,
           cast(sum(x * x) as bigint) AS sum_x2,
           cast(sum(y * y) as bigint) AS sum_y2
    FROM e GROUP BY event_type
    """,
)
def _q_corr_moments(sf_dir: str):
    """Distributed second moments (the covariance/correlation/variance
    building blocks): all five sums accumulate as exact int64 in a
    per-batch combiner — one streaming pass, order-independent, from
    which corr(x,y) = (n·Σxy − ΣxΣy)/√((n·Σx²−(Σx)²)(n·Σy²−(Σy)²))
    follows on the driver with no second pass."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                             round_mode="half_towards_infinity"), pa.int64())
        y = pc.cast(pc.hour(b["ts"]), pa.int64())
        t = pa.table({
            "event_type": b["event_type"],
            "n": pa.repeat(pa.scalar(1, pa.int64()), b.num_rows),
            "sum_x": x, "sum_y": y,
            "sum_xy": pc.multiply(x, y),
            "sum_x2": pc.multiply(x, x),
            "sum_y2": pc.multiply(y, y),
        })
        cols = ["n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]
        return (t.group_by("event_type")
                .aggregate([(c, "sum") for c in cols])
                .rename_columns(["event_type", *cols]))

    cols = ["n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]
    return (ev.map_batches(part, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(*[Sum(c, alias_name=c) for c in cols]))


@register(
    "supplier_balance_rollup",
    """
    WITH s AS (SELECT r_name, n_name,
                      cast(round(s_acctbal * 100) as bigint) AS cents
               FROM supplier
               JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey)
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           cast(sum(cents) as bigint) AS sum_cents,
           count(*) AS n_sup
    FROM s GROUP BY ROLLUP(r_name, n_name)
    """,
)
def _q_balance_rollup(sf_dir: str):
    """GROUP BY ROLLUP as hierarchical re-aggregation: ONE scan computes
    the finest (region, nation) partials (dims resolved via a broadcast
    lookup — never a shuffle join for a 25-row table); each fine row
    then explodes into its 3 rollup levels and a second, partial-sized
    groupby sums them. The corpus is read once; coarser levels reuse the
    fine partials instead of rescanning."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray
    from ray.data.aggregate import Sum

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name",
                                      "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nat = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")
    lut_ref = ray.put({int(r.n_nationkey): (r.r_name, r.n_name)
                       for r in nat.itertuples()})

    sup = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def part(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        keys = b["s_nationkey"].to_numpy(zero_copy_only=False)
        names = [lut[int(kk)] for kk in keys]
        cents = pc.cast(pc.round(pc.multiply(b["s_acctbal"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        t = pa.table({
            "region": pa.array([r for r, _ in names], pa.string()),
            "nation": pa.array([nn for _, nn in names], pa.string()),
            "sum_cents": cents,
            "n_sup": pa.repeat(pa.scalar(1, pa.int64()), b.num_rows),
        })
        return (t.group_by(["region", "nation"])
                .aggregate([("sum_cents", "sum"), ("n_sup", "sum")])
                .rename_columns(["region", "nation", "sum_cents", "n_sup"]))

    def explode_levels(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        lv1 = df.assign(nation="ALL")
        lv2 = df.assign(region="ALL", nation="ALL")
        return pa.Table.from_pandas(pd.concat([df, lv1, lv2],
                                              ignore_index=True),
                                    preserve_index=False)

    return (sup.map_batches(part, batch_format="pyarrow")
            .map_batches(explode_levels, batch_format="pyarrow")
            .groupby(["region", "nation"])
            .aggregate(Sum("sum_cents", alias_name="sum_cents"),
                       Sum("n_sup", alias_name="n_sup")))


@register(
    "stratified_doc_sample",
    """
    SELECT lang, doc_id, n_chars FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY lang
      ORDER BY (doc_id * 48271 + 11) % 2147483647, doc_id) <= 20
    """,
)
def _q_stratified_sample(sf_dir: str):
    """Deterministic stratified sample (20 docs per language) by
    ascending affine id-hash — no RNG state, so any partition re-runs to
    the same sample and the SQL oracle replays the selection exactly
    (stages/sampling.py)."""
    from .stages.sampling import stratified_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return stratified_sample(docs, key_col="lang", id_col="doc_id",
                             n_per_key=20, keep_cols=("n_chars",))


@register(
    "weighted_doc_sample",
    """
    WITH d AS (SELECT doc_id, n_chars,
                      pow((((doc_id * 48271 + 11) % 2147483647) + 1.0)
                            / 2147483647.0,
                          1.0 / n_chars) AS key
               FROM documents WHERE n_chars > 0)
    SELECT doc_id, n_chars FROM d ORDER BY key DESC, doc_id LIMIT 50
    """,
)
def _q_weighted_sample(sf_dir: str):
    """Weighted sample without replacement (50 docs, weight = length) —
    Efraimidis-Spirakis A-ES keys from the deterministic affine draw;
    per-batch partial top-k tournament, never a global sort
    (stages/sampling.py)."""
    from .stages.sampling import weighted_sample

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return weighted_sample(docs, id_col="doc_id", weight_col="n_chars",
                           k=50)


@register(
    "heavy_hitter_words",
    """
    SELECT tok AS word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, word
    LIMIT 10
    """,
)
def _q_heavy_hitters(sf_dir: str):
    """Sketch-guided EXACT top-10 tokens: Misra-Gries candidate pass +
    exact recount of candidates only, runtime-certified against the MG
    error bound (stages/sketch.py). Same answer as the full-shuffle
    word_freq path, but only O(width) rows per batch ever shuffle."""
    from .stages.sketch import heavy_hitter_words

    docs = _read(sf_dir, "documents", ["text"])
    return heavy_hitter_words(docs, text_col="text", k=10, width=1024)


@register(
    "approx_distinct_users_by_type",
    """
    SELECT v.event_type, CAST(v.approx_distinct AS BIGINT) AS approx_distinct
    FROM (VALUES (6000,'click',15),(6000,'error',15),(6000,'purchase',15),
                 (6000,'signup',15),(6000,'view',15),
                 (60000,'click',152),(60000,'error',152),(60000,'purchase',152),
                 (60000,'signup',152),(60000,'view',152))
         AS v(sf_key, event_type, approx_distinct)
    WHERE v.sf_key = (SELECT count(*) FROM lineitem)
    """,
)
def _q_approx_distinct(sf_dir: str):
    """HyperLogLog COUNT DISTINCT per event type. An estimate has no
    SQL-exact form, but the sketch is fully deterministic, so the oracle
    PINS the estimates at the two correctness scales (keyed by lineitem
    count) — register-path or hash drift breaks the value-hash. Accuracy
    ±1.04/√4096 ≈ 1.6% and the merge=union property stay pinned in
    pytest; the exact counterpart (`distinct_users_by_type`) stays
    live-oracle-checked."""
    from .stages.sketch import hll_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return hll_distinct(ev, key_col="event_type", val_col="user_id", p=12)


@register(
    "user_event_type_seq",
    """
    SELECT user_id,
           string_agg(event_type, ','
                      ORDER BY epoch_us(ts), event_id) AS seq,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def _q_event_type_seq(sf_dir: str):
    """Per-user ordered behavior sequence (SQL string_agg ... ORDER BY
    with full tie-break) — one coarse-bucket shuffle, vectorized
    sort + join per bucket (stages/windows.py
    ``grouped_ordered_concat``)."""
    from .stages.windows import grouped_ordered_concat

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    return grouped_ordered_concat(ev, key_col="user_id", ts_col="ts",
                                  id_col="event_id", val_col="event_type")


@register(
    "docs_incremental_exact_dedup",
    """
    SELECT doc_id, n_chars FROM documents d
    WHERE doc_id >= 400
      AND NOT EXISTS (SELECT 1 FROM documents c
                      WHERE c.doc_id < 400 AND c.text = d.text)
    """,
)
def _q_incremental_dedup(sf_dir: str):
    """Incremental ingestion dedup, exact pass (stages/dedup.py
    ``dedup_new_against_corpus`` with ``near=False``): docs 400+ play
    the nightly batch, docs <400 the archive; the Bloom-prefiltered
    content-hash anti join drops new docs whose text already exists in
    the archive. The near (MinHash probe) pass is pytest-covered — an
    LSH estimate has no exact SQL form."""
    import ray.data

    from .stages.dedup import dedup_new_against_corpus

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    corpus = docs.filter(expr="doc_id < 400")
    new = docs.filter(expr="doc_id >= 400")
    out = dedup_new_against_corpus(new, corpus, near=False,
                                   num_partitions=_table_partitions(
                                       sf_dir, "documents"))
    return out.select_columns(["doc_id", "n_chars"])


@register(
    "error_prev_click_value",
    """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t
               FROM events WHERE event_type = 'error'),
    c AS (SELECT user_id, epoch_us(ts) AS t, event_id AS rid,
                 cast(round(value * 100) as bigint) AS v
          FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id, e.t,
           coalesce(cv.v, -1) AS prev_click_units
    FROM e LEFT JOIN LATERAL (
      SELECT v FROM c
      WHERE c.user_id = e.user_id AND c.t <= e.t
      ORDER BY c.t DESC, c.rid DESC LIMIT 1) cv ON true
    """,
)
def _q_asof_value(sf_dir: str):
    """Value-emitting backward as-of join: for each error event, the
    VALUE (fixed-point cents) of the latest click at or before it, tie
    broken by (t, event_id) — the payload-fetching form of
    error_prev_click_asof (stages/joins.py ``asof_join_value``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.joins import asof_join_value

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type", "value"])
    left = ev.filter(expr="event_type == 'error'")

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"], "user_id": b["user_id"],
            "ts": b["ts"],
            "v": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                  round_mode="half_towards_infinity"),
                         pa.int64()),
        })

    right = (ev.filter(expr="event_type == 'click'")
             .map_batches(cents, batch_format="pyarrow"))
    return asof_join_value(left, right, key="user_id", ts="ts",
                           left_id="event_id", right_id="event_id",
                           right_val="v", out_col="prev_click_units")


@register(
    "error_click_range_sum",
    """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t
               FROM events WHERE event_type = 'error'),
    c AS (SELECT user_id, epoch_us(ts) AS t,
                 cast(round(value * 100) as bigint) AS v
          FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id, e.t,
           coalesce(cv.s, 0) AS click_units_1h,
           coalesce(cv.n, 0) AS n_clicks_1h
    FROM e LEFT JOIN LATERAL (
      SELECT cast(sum(v) as bigint) AS s, count(*) AS n FROM c
      WHERE c.user_id = e.user_id
        AND c.t BETWEEN e.t - 3600000000 AND e.t) cv ON true
    """,
)
def _q_range_sum(sf_dir: str):
    """Windowed aggregate over a temporal range join: for each error,
    the fixed-point SUM (and count) of click values in the preceding
    hour — two searchsorted probes against a per-key cumsum, no pair
    explosion (stages/joins.py ``range_join_sum``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.joins import range_join_sum

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type", "value"])
    left = ev.filter(expr="event_type == 'error'")

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"], "ts": b["ts"],
            "v": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                  round_mode="half_towards_infinity"),
                         pa.int64()),
        })

    right = (ev.filter(expr="event_type == 'click'")
             .map_batches(cents, batch_format="pyarrow"))
    return range_join_sum(left, right, key="user_id", ts="ts",
                          left_id="event_id", right_val="v",
                          before_us=3_600_000_000, after_us=0,
                          out_col="click_units_1h", n_col="n_clicks_1h")


@register(
    "props_json_k_stats",
    """
    SELECT event_type, count(*) AS n,
           cast(sum(cast(json_extract_string(props, '$.k') as bigint))
                as bigint) AS sum_k,
           cast(max(cast(json_extract_string(props, '$.k') as bigint))
                as bigint) AS max_k
    FROM events GROUP BY event_type
    """,
)
def _q_props_json(sf_dir: str):
    """Semi-structured column extraction: the JSON ``props`` payload is
    parsed with ONE vectorized Arrow regex kernel (``pc.extract_regex``
    — no per-row json.loads in the hot path; a full parser drops in for
    nested payloads), then the usual combiner + groupby. DuckDB's
    json_extract is the oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Sum

    ev = _read(sf_dir, "events", ["event_type", "props"])

    def part(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], pattern=r'"k":\s*(?P<kval>-?\d+)')
        k = pc.cast(pc.struct_field(m, "kval"), pa.int64())
        t = pa.table({"event_type": b["event_type"],
                      "n": pa.repeat(pa.scalar(1, pa.int64()), b.num_rows),
                      "sum_k": k, "max_k": k})
        return (t.group_by("event_type")
                .aggregate([("n", "sum"), ("sum_k", "sum"),
                            ("max_k", "max")])
                .rename_columns(["event_type", "n", "sum_k", "max_k"]))

    return (ev.map_batches(part, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_k", alias_name="sum_k"),
                       Max("max_k", alias_name="max_k")))


@register(
    "order_price_rank",
    """
    WITH o AS (SELECT o_orderkey,
                      cast(round(o_totalprice * 100) as bigint) AS price_fx
               FROM orders)
    SELECT o_orderkey, price_fx,
           cast(row_number() OVER (ORDER BY price_fx, o_orderkey)
                as bigint) AS rnk
    FROM o
    """,
)
def _q_order_rank(sf_dir: str):
    """Global ordering rank over the whole table (SQL row_number OVER a
    total order): range-partitioned rank — per-bucket counts give
    exclusive offsets, each bucket ranks locally and adds its offset —
    no global merge step (stages/scan.py ``global_rank``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.scan import global_rank

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def fx(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "price_fx": pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0),
                                         round_mode="half_towards_infinity"),
                                pa.int64()),
        })

    return global_rank(orders.map_batches(fx, batch_format="pyarrow"),
                       val_col="price_fx", id_col="o_orderkey",
                       out_col="rnk")


# ---------------------------------------------------------------------------
# Round-4 additions: funnel analysis, fuzzy blocked similarity join, grouped
# mode, NTILE, GROUP BY CUBE, and SQL set operations (INTERSECT / EXCEPT)
# ---------------------------------------------------------------------------


@register(
    "user_funnel",
    """
    WITH m AS (SELECT user_id,
                      min(ts) FILTER (event_type = 'view')     AS tv,
                      min(ts) FILTER (event_type = 'click')    AS tc,
                      min(ts) FILTER (event_type = 'purchase') AS tp
               FROM events
               WHERE event_type IN ('view', 'click', 'purchase')
               GROUP BY user_id)
    SELECT user_id,
           cast((tv IS NOT NULL) as bigint) + cast((tc IS NOT NULL) as bigint)
             + cast((tp IS NOT NULL) as bigint)              AS n_steps,
           cast(coalesce(tv < tc AND tc < tp, FALSE) as bigint) AS converted
    FROM m
    """,
)
def _q_user_funnel(sf_dir: str):
    """Ordered funnel conversion (view → click → purchase) per user: a
    batch-local (user, step, min-ts) Arrow combiner then one coarse
    key-bucket groupby whose kernel pivots and checks the strict
    min-ts ordering — the event stream never shuffles
    (stages/windows.py ``funnel_conversion``)."""
    from .stages.windows import funnel_conversion

    events = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return funnel_conversion(events, steps=["view", "click", "purchase"],
                             key_col="user_id", ts_col="ts",
                             type_col="event_type")


@register(
    "part_name_fuzzy_pairs",
    r"""
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           cast(levenshtein(a.p_name, b.p_name) as bigint) AS dist
    FROM n a JOIN n b
      ON regexp_extract(a.p_name, '(\S+)$', 1)
           = regexp_extract(b.p_name, '(\S+)$', 1)
     AND a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def _q_part_fuzzy(sf_dir: str):
    """Blocked edit-distance similarity self-join — the ER fuzzy-match
    shape (reference scores candidates with Levenshtein after exact
    blocking; SURVEY.md §2.8) as a standalone operator: distinct part
    names, blocked on the trailing word, verified by Levenshtein <= 2
    (stages/fuzzy.py ``fuzzy_value_pairs``)."""
    from .stages.fuzzy import fuzzy_value_pairs

    part = _read(sf_dir, "part", ["p_name"])
    return fuzzy_value_pairs(part, col="p_name", max_dist=2,
                             block="last_token")


def _phonetic_sql() -> tuple[str, str]:
    from .functions.phonetic import soundex_sql_expr

    blocks = f"""
    SELECT {soundex_sql_expr('p_name')} AS key,
           count(*) AS n_parts,
           cast(count(distinct p_name) as bigint) AS n_names
    FROM part GROUP BY key
    """
    last = r"regexp_extract(p_name, '(\S+)$', 1)"
    pairs = f"""
    WITH n AS (SELECT DISTINCT p_name,
                      {soundex_sql_expr(last)} AS k
               FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           cast(levenshtein(a.p_name, b.p_name) as bigint) AS dist
    FROM n a JOIN n b
      ON a.k = b.k AND a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= 2
    """
    return blocks, pairs


_PHONETIC_BLOCKS_SQL, _PHONETIC_PAIRS_SQL = _phonetic_sql()


@register("part_name_soundex_blocks", _PHONETIC_BLOCKS_SQL)
def _q_part_soundex_blocks(sf_dir: str):
    """Phonetic blocking-key profile: every part name keyed by
    simplified Soundex (functions/phonetic.py — the classic
    record-linkage blocking family beside surface-hash, LSH and
    sorted-neighborhood), with per-key row and distinct-name counts.
    The key computation is the VECTORIZED kernel (one LUT gather over
    the Arrow utf-8 buffer + offset arithmetic, no per-row Python);
    both aggregation levels ride bucketed_agg. The oracle recomputes
    the identical key via chained RE2 replaces (soundex_sql_expr)."""
    import pyarrow as pa

    from .functions.phonetic import soundex_arrow
    from .stages.agg import bucketed_agg

    part = _read(sf_dir, "part", ["p_name"])

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table({"p_name": b["p_name"],
                         "key": soundex_arrow(b["p_name"])})

    per_name = bucketed_agg(part.map_batches(keyed, batch_format="pyarrow"),
                            ["p_name", "key"],
                            [("p_name", "count", "n_rows")])
    return bucketed_agg(per_name, ["key"],
                        [("n_rows", "sum", "n_parts"),
                         ("n_rows", "count", "n_names")])


@register("part_name_phonetic_pairs", _PHONETIC_PAIRS_SQL)
def _q_part_phonetic_pairs(sf_dir: str):
    """Phonetic fuzzy similarity self-join: distinct part names blocked
    by the simplified-Soundex key of their TRAILING token (the phonetic
    widening of part_name_fuzzy_pairs — last-token variants that merely
    sound alike still land in one block), verified by Levenshtein <= 2
    (same stages/fuzzy.fuzzy_value_pairs plan, block="soundex_last_token").
    Blocking recall below 1 is the phonetic family's documented trade:
    the query's contract is pairs AGREEING on the key, which the
    oracle's equality join replicates exactly."""
    from .stages.fuzzy import fuzzy_value_pairs

    part = _read(sf_dir, "part", ["p_name"])
    return fuzzy_value_pairs(part, col="p_name", max_dist=2,
                             block="soundex_last_token")


@register(
    "customer_order_overlaps",
    """
    WITH mx AS (SELECT l_orderkey, max(epoch_us(l_shipdate)) AS e
                FROM lineitem GROUP BY l_orderkey),
    iv AS (SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS s, e
           FROM orders JOIN mx ON mx.l_orderkey = o_orderkey)
    SELECT a.o_custkey, a.o_orderkey AS id_a, b.o_orderkey AS id_b,
           cast(least(a.e, b.e) - greatest(a.s, b.s) as bigint)
             AS overlap_us
    FROM iv a JOIN iv b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND a.s <= b.e AND b.s <= a.e
    """,
)
def _q_customer_order_overlaps(sf_dir: str):
    """Interval-overlap self-join (the temporal-conflict operator): per
    customer, every pair of orders whose fulfillment intervals
    [orderdate, max shipdate] intersect, with the overlap length.
    Intervals build from a per-order max-shipdate combiner joined to
    orders; the pair generation is stages/joins.interval_overlap_pairs —
    rows sort by (key, start) per coarse key bucket and a single
    structured-view searchsorted finds every overlap run (starts
    ascending ⇒ partners of a row are one contiguous slice), so pairs
    emit vectorized and the all-pairs product never materializes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.agg import bucketed_agg
    from .stages.joins import interval_overlap_pairs

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def li_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "ship_us": pc.cast(pc.cast(b["l_shipdate"],
                                       pa.timestamp("us")), pa.int64())})

    ends = bucketed_agg(li.map_batches(li_prep, batch_format="pyarrow"),
                        ["l_orderkey"], [("ship_us", "max", "e")])

    def o_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "s": pc.cast(pc.cast(b["o_orderdate"],
                                 pa.timestamp("us")), pa.int64())})

    np_ = _table_partitions(sf_dir, "orders", "lineitem")
    # groupby → join needs the untyped-empty-block scrub on Ray 2.49
    iv = (orders.map_batches(o_prep, batch_format="pyarrow")
          .join(ends.repartition(np_), "inner", np_,
                on=("o_orderkey",), right_on=("l_orderkey",)))
    return interval_overlap_pairs(iv, key_col="o_custkey",
                                  id_col="o_orderkey",
                                  start_col="s", end_col="e")


@register(
    "user_top_event_type",
    """
    SELECT user_id, event_type AS mode_val, cast(cnt as bigint) AS n
    FROM (SELECT user_id, event_type, count(*) AS cnt,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY count(*) DESC, event_type) AS rn
          FROM events GROUP BY user_id, event_type)
    WHERE rn = 1
    """,
)
def _q_user_mode(sf_dir: str):
    """Per-key MODE (most frequent event type, ties → smallest value):
    batch-local (key, val, count) combiner partials, one coarse
    key-bucket groupby with a vectorized argmax kernel — raw events
    never shuffle (stages/sketch.py ``grouped_mode``)."""
    from .stages.sketch import grouped_mode

    events = _read(sf_dir, "events", ["user_id", "event_type"])
    return grouped_mode(events, key_col="user_id", val_col="event_type")


@register(
    "order_price_ntile",
    """
    WITH o AS (SELECT o_orderkey,
                      cast(round(o_totalprice * 100) as bigint) AS price_fx
               FROM orders)
    SELECT o_orderkey, price_fx,
           cast(ntile(8) OVER (ORDER BY price_fx, o_orderkey) as bigint)
             AS tile
    FROM o
    """,
)
def _q_order_ntile(sf_dir: str):
    """SQL NTILE over a global ordering (including the remainder rule:
    the first total%k buckets get one extra row) — the same
    range-partitioned shape as order_price_rank, with the tile a pure
    function of rank and total (stages/scan.py ``global_ntile``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.scan import global_ntile

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def fx(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "price_fx": pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0),
                                         round_mode="half_towards_infinity"),
                                pa.int64()),
        })

    return global_ntile(orders.map_batches(fx, batch_format="pyarrow"),
                        val_col="price_fx", id_col="o_orderkey", k=8)


@register(
    "customer_balance_cube",
    """
    WITH c AS (SELECT n_name, c_mktsegment,
                      cast(round(c_acctbal * 100) as bigint) AS cents
               FROM customer JOIN nation ON c_nationkey = n_nationkey)
    SELECT coalesce(n_name, 'ALL')       AS nation,
           coalesce(c_mktsegment, 'ALL') AS segment,
           cast(sum(cents) as bigint)    AS sum_cents,
           count(*)                      AS n_cust
    FROM c GROUP BY CUBE(n_name, c_mktsegment)
    """,
)
def _q_balance_cube(sf_dir: str):
    """GROUP BY CUBE as hierarchical re-aggregation (the 2-dim sibling of
    supplier_balance_rollup): ONE scan computes the finest (nation,
    segment) partials via a broadcast dim lookup; each fine row explodes
    into its 4 cube cells and a second, partial-sized groupby sums them —
    the corpus is read once, every coarser cell reuses the fine
    partials."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray
    from ray.data.aggregate import Sum

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    lut_ref = ray.put(dict(zip(nation["n_nationkey"].astype(int),
                               nation["n_name"])))

    cust = _read(sf_dir, "customer",
                 ["c_nationkey", "c_mktsegment", "c_acctbal"])

    def part(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        names = [lut[int(kk)] for kk in
                 b["c_nationkey"].to_numpy(zero_copy_only=False)]
        cents = pc.cast(pc.round(pc.multiply(b["c_acctbal"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        t = pa.table({
            "nation": pa.array(names, pa.string()),
            "segment": b["c_mktsegment"],
            "sum_cents": cents,
            "n_cust": pa.repeat(pa.scalar(1, pa.int64()), b.num_rows),
        })
        return (t.group_by(["nation", "segment"])
                .aggregate([("sum_cents", "sum"), ("n_cust", "sum")])
                .rename_columns(["nation", "segment", "sum_cents", "n_cust"]))

    def explode_cells(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        cells = [df,
                 df.assign(segment="ALL"),
                 df.assign(nation="ALL"),
                 df.assign(nation="ALL", segment="ALL")]
        return pa.Table.from_pandas(pd.concat(cells, ignore_index=True),
                                    preserve_index=False)

    return (cust.map_batches(part, batch_format="pyarrow")
            .map_batches(explode_cells, batch_format="pyarrow")
            .groupby(["nation", "segment"])
            .aggregate(Sum("sum_cents", alias_name="sum_cents"),
                       Sum("n_cust", alias_name="n_cust")))


@register(
    "urgent_not_low_custkeys",
    """
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def _q_except_custkeys(sf_dir: str):
    """SQL EXCEPT as distinct-then-Bloom-prefiltered-anti-join: both
    sides reduce to key rows before any shuffle, and left keys the Bloom
    filter rules out bypass the join entirely (stages/joins.py
    ``except_distinct``)."""
    from .stages.joins import except_distinct

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    urgent = orders.filter(expr="o_orderpriority == '1-URGENT'")
    low = orders.filter(expr="o_orderpriority == '5-LOW'")
    return except_distinct(urgent, low, on=("o_custkey",),
                           num_partitions=_table_partitions(sf_dir, "orders"),
                           bloom_bits=1 << 20)


@register(
    "urgent_and_low_custkeys",
    """
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def _q_intersect_custkeys(sf_dir: str):
    """SQL INTERSECT as distinct-then-semi-join (stages/joins.py
    ``intersect_distinct``) — the set-op twin of
    urgent_not_low_custkeys."""
    from .stages.joins import intersect_distinct

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    urgent = orders.filter(expr="o_orderpriority == '1-URGENT'")
    low = orders.filter(expr="o_orderpriority == '5-LOW'")
    return intersect_distinct(urgent, low, on=("o_custkey",),
                              num_partitions=_table_partitions(sf_dir, "orders"))


@register(
    "doc_repetition_stats",
    """
    SELECT doc_id, cast(sum(c) as bigint) AS n_tokens,
           count(*) AS n_distinct, cast(max(c) as bigint) AS max_tok_freq
    FROM (SELECT doc_id, tok, count(*) AS c
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents)
          GROUP BY doc_id, tok)
    GROUP BY doc_id
    """,
)
def _q_repetition(sf_dir: str):
    """Per-doc repetition quality signals (type/token ratio + hottest
    token count — the Gopher boilerplate filters): pure batch-local
    kernels, zero shuffle (functions/textstats.py ``repetition_stats``)."""
    from .functions.textstats import repetition_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(repetition_stats, batch_format="pyarrow")


@register(
    "docs_contaminated_4gram",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(w) - 2, 1)),
                    i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3])) AS g
      FROM toks WHERE len(w) >= 4)
    SELECT DISTINCT t.doc_id
    FROM grams t
    JOIN (SELECT DISTINCT g FROM grams WHERE doc_id < 20) b USING (g)
    WHERE t.doc_id >= 20
    """,
)
def _q_contaminated(sf_dir: str):
    """Benchmark decontamination: training docs (doc_id >= 20) sharing
    any 4-word shingle with the held-out set (doc_id < 20). Eval grams
    broadcast once as a sorted hash array; the training corpus streams
    through one searchsorted probe pass — it never shuffles
    (stages/decontam.py ``contaminated_doc_ids``; a distributed
    semi-join plan takes over past the broadcast cap)."""
    from .stages.decontam import contaminated_doc_ids

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    train = docs.filter(expr="doc_id >= 20")
    test = docs.filter(expr="doc_id < 20")
    return contaminated_doc_ids(train, test, ngram=4)


@register(
    "user_value_quartile",
    """
    WITH e AS (SELECT user_id, event_id,
                      cast(round(value * 100) as bigint) AS value_units
               FROM events)
    SELECT user_id, event_id, value_units,
           cast(ntile(4) OVER (PARTITION BY user_id
                               ORDER BY value_units, event_id) as bigint)
             AS tile
    FROM e
    """,
)
def _q_user_quartile(sf_dir: str):
    """Per-key NTILE (user value quartiles, SQL remainder rule included):
    one coarse key-bucket shuffle, segmented vectorized kernel across
    every key in the bucket (stages/windows.py ``grouped_ntile``)."""
    from .stages.windows import grouped_ntile

    events = _read(sf_dir, "events", ["user_id", "event_id", "value"])
    return grouped_ntile(events, key_col="user_id", id_col="event_id",
                         val_col="value", k=4)


@register(
    "mixed_corpus_by_lang",
    """
    SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'
    UNION ALL
    SELECT doc_id, lang, n_chars FROM documents
    WHERE lang <> 'en'
      AND ((doc_id * 48271 + 11 + 1) % 2147483647) % 4 < 1
    """,
)
def _q_mixed_corpus(sf_dir: str):
    """Deterministic training-data source mixing: keep all English docs,
    thin every other language to 25% with the RNG-free affine draw —
    pure streaming filter + union, no shuffle, partition-independent and
    SQL-replayable (stages/sampling.py ``mix_corpora`` / ``rate_thin``)."""
    from .stages.sampling import mix_corpora

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    en = docs.filter(expr="lang == 'en'")
    rest = docs.filter(expr="lang != 'en'")
    return mix_corpora([(en, 1, 1), (rest, 1, 4)], id_col="doc_id")


@register(
    "part_attrs_unpivot",
    """
    SELECT p_partkey, 'size' AS attr, cast(p_size as bigint) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'retail_cents' AS attr,
           cast(round(p_retailprice * 100) as bigint) AS val
    FROM part
    """,
)
def _q_part_unpivot(sf_dir: str):
    """UNPIVOT / melt (wide → long): per batch, stack the K attribute
    columns into (key, attr, val) rows with one vectorized concat — a
    pure map, no shuffle; the long form feeds generic per-attr
    aggregates downstream."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    part = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def melt(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cents = pc.cast(pc.round(pc.multiply(b["p_retailprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        keys = b["p_partkey"].combine_chunks()
        return pa.table({
            "p_partkey": pa.concat_arrays([keys, keys]),
            "attr": pa.array(["size"] * n + ["retail_cents"] * n,
                             pa.string()),
            "val": pa.concat_arrays([
                pc.cast(b["p_size"], pa.int64()).combine_chunks(),
                cents.combine_chunks()]),
        })

    return part.map_batches(melt, batch_format="pyarrow")


@register(
    "events_hourly_gapfill",
    """
    WITH hours AS (
      SELECT unnest(generate_series(
        date_trunc('hour', (SELECT min(ts) FROM events)),
        date_trunc('hour', (SELECT max(ts) FROM events)),
        INTERVAL 1 HOUR)) AS hour),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                      count(*) AS n
               FROM events GROUP BY 1, 2)
    SELECT t.event_type, h.hour, coalesce(c.n, 0) AS n
    FROM types t CROSS JOIN hours h
    LEFT JOIN counts c ON c.event_type = t.event_type AND c.hour = h.hour
    """,
)
def _q_events_hourly_gapfill(sf_dir: str):
    """Time-series densification: hourly counts per event_type with ZERO
    rows for silent hours (the gap-fill every monitoring/feature pipeline
    needs before a rolling model sees the series). Combiner groupby for
    the counts, one Min/Max aggregate for the range, per-key vectorized
    arange fill — see stages/windows.gap_fill_counts."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.windows import gap_fill_counts

    ev = _read(sf_dir, "events", ["event_type", "ts"])
    out = gap_fill_counts(ev, key_col="event_type", ts_col="ts",
                          width_us=3_600_000_000, bucket_col="hour")

    def to_us(b: pa.Table) -> pa.Table:
        # pandas kernels re-emerge as ns; pin the oracle's us unit
        return b.set_column(b.schema.get_field_index("hour"), "hour",
                            pc.cast(b["hour"], pa.timestamp("us")))

    return out.map_batches(to_us, batch_format="pyarrow")


@register(
    "user_median_value",
    """
    SELECT user_id,
           quantile_disc(cast(round(value * 1000000) as bigint), 0.5)
             AS median_units
    FROM events GROUP BY user_id
    """,
)
def _q_user_median_value(sf_dir: str):
    """Per-key exact discrete median (percentile_disc 0.5) — an order
    statistic, NOT a combinable aggregate: the coarse key-hash-bucket
    shuffle co-locates each key's values, one segmented vectorized pick
    per bucket (stages/windows.grouped_quantile_disc; the ceil(q*n)-1
    index is pinned to DuckDB quantile_disc semantics in pytest)."""
    from .stages.windows import grouped_quantile_disc

    ev = _read(sf_dir, "events", ["user_id", "value"])
    return grouped_quantile_disc(ev, key_col="user_id", val_col="value",
                                 q=0.5, out_col="median_units")


@register(
    "orders_snapshot_diff",
    """
    WITH a AS (SELECT o_orderkey,
                      cast(round(o_totalprice * 100) as bigint) AS cents
               FROM orders WHERE o_orderkey % 97 <> 0),
    b AS (SELECT o_orderkey,
                 cast(round(o_totalprice * 100) as bigint)
                 + CASE WHEN o_orderkey % 50 = 0 THEN 1 ELSE 0 END AS cents
          FROM orders WHERE o_orderkey % 89 <> 0)
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           coalesce(a.cents, -1) AS old_cents,
           coalesce(b.cents, -1) AS new_cents
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.cents <> b.cents
    """,
)
def _q_orders_snapshot_diff(sf_dir: str):
    """CDC-style snapshot reconciliation: two deterministic snapshots
    derived from orders (modulus-keyed deletions on each side + a 1-cent
    perturbation on every 50th key) diffed by stages/diff.snapshot_diff —
    the FULL OUTER JOIN + CASE shape as a slim tag-union co-group."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.diff import snapshot_diff

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def snap(side: int):
        mod = 97 if side == 0 else 89

        def f(b: pa.Table) -> pa.Table:
            import numpy as np
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            cents = pc.cast(
                pc.round(pc.multiply(b["o_totalprice"], 100.0),
                         round_mode="half_towards_infinity"),
                pa.int64()).to_numpy(zero_copy_only=False)
            if side == 1:
                cents = cents + ((k % 50) == 0)
            keep = (k % mod) != 0
            return pa.table({"o_orderkey": pa.array(k[keep]),
                             "cents": pa.array(cents[keep])})
        return f

    old = orders.map_batches(snap(0), batch_format="pyarrow")
    new = orders.map_batches(snap(1), batch_format="pyarrow")
    return snapshot_diff(old, new, key_col="o_orderkey", val_col="cents",
                         num_buckets=_table_partitions(sf_dir, "orders"))


@register(
    "doc_redaction_stats",
    r"""
    SELECT doc_id,
           length(regexp_replace(text, '\b(key|hash|table)\b', '<x>', 'g'))
             AS redacted_len,
           len(regexp_extract_all(text, '\b(key|hash|table)\b')) AS n_hits
    FROM documents
    """,
)
def _q_doc_redaction_stats(sf_dir: str):
    """PII-shaped redaction scrub: mask a term list behind word
    boundaries and report per-doc hit counts + post-redaction length —
    pure zero-copy Arrow RE2 kernels (replace_substring_regex /
    count_substring_regex), no Python row loop; both engines run RE2 so
    \\b semantics agree exactly (verified at build time)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pat = r"\b(key|hash|table)\b"

    def red(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "redacted_len": pc.cast(pc.utf8_length(
                pc.replace_substring_regex(b["text"], pattern=pat,
                                           replacement="<x>")), pa.int64()),
            "n_hits": pc.cast(pc.count_substring_regex(b["text"],
                                                       pattern=pat),
                              pa.int64()),
        })

    return docs.map_batches(red, batch_format="pyarrow")


@register(
    "user_seq_pattern_count",
    """
    SELECT user_id,
           len(regexp_extract_all(
               string_agg(event_type, ',' ORDER BY epoch_us(ts), event_id),
               'view(,click)+,purchase')) AS n_matches
    FROM events GROUP BY user_id
    """,
)
def _q_user_seq_pattern_count(sf_dir: str):
    """MATCH_RECOGNIZE-lite: count per user of the behavioral pattern
    view → click+ → purchase over the time-ordered event-type sequence.
    Rides grouped_ordered_concat (one coarse-bucket shuffle) and then a
    pure Arrow RE2 count over the sequence strings — event types are
    comma-delimited whole tokens, so the regex is anchored by the
    delimiters; both engines run RE2, so non-overlapping greedy match
    semantics agree exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.windows import grouped_ordered_concat

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    seq = grouped_ordered_concat(ev, key_col="user_id", ts_col="ts",
                                 id_col="event_id", val_col="event_type")

    def count(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "n_matches": pc.cast(
                pc.count_substring_regex(
                    b["seq"], pattern=r"view(,click)+,purchase"),
                pa.int64()),
        })

    return seq.map_batches(count, batch_format="pyarrow")


def _pagerank_sql(iters: int = 5) -> str:
    """Unrolled 5-iteration PageRank as chained CTEs — possible only
    because the Ray operator runs exact int64 fixed-point arithmetic
    (stages/graph.py), so an ITERATIVE graph algorithm gets a full
    value-hash oracle instead of the usual rows-only check."""
    units = 10**15
    parts = [f"""
    WITH e0 AS (SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst
                FROM lineitem
                UNION ALL
                SELECT l_partkey*2+1 AS src, l_orderkey*2 AS dst
                FROM lineitem),
    e AS (SELECT DISTINCT src, dst FROM e0),
    deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
    params AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT node, cast({units} // (SELECT n FROM params) AS bigint)
                  AS r, d
           FROM deg)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
    c{i} AS (SELECT e.dst AS node,
                    sum((85 * r{i-1}.r) // (100 * r{i-1}.d)) AS s
             FROM e JOIN r{i-1} ON e.src = r{i-1}.node GROUP BY e.dst),
    r{i} AS (SELECT r{i-1}.node,
                    cast((SELECT (15 * {units}) // (100 * n) FROM params)
                         + coalesce(c{i}.s, 0) AS bigint) AS r,
                    r{i-1}.d
             FROM r{i-1} LEFT JOIN c{i} ON c{i}.node = r{i-1}.node)""")
    parts.append(f"\n    SELECT node, r FROM r{iters}")
    return "".join(parts)


@register("part_order_pagerank", _pagerank_sql(5))
def _q_part_order_pagerank(sf_dir: str):
    """Entity-popularity prior via PageRank over the undirected-ized
    order↔part co-purchase graph (generalizes the reference's
    incoming-link-count boost, entity_sort/data_process.py). 5 exact
    fixed-point iterations on the RESIDENT edge-shard engine
    (stages/graph_actors.py): edges hash-partition into long-lived
    actors once, each iteration exchanges only pre-combined per-dst
    contributions — never the edge list (A/B at sf0.1: 19.7 s shuffle
    loop → ~1.7 s incl. build; bit-identical, equivalence-tested
    against stages/graph.pagerank)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.graph_actors import GraphEngine

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def both(b: pa.Table) -> pa.Table:
        ok = pc.cast(b["l_orderkey"], pa.int64())
        pk = pc.cast(b["l_partkey"], pa.int64())
        o2 = pc.multiply(ok, 2).combine_chunks() \
            if isinstance(ok, pa.ChunkedArray) else pc.multiply(ok, 2)
        p2 = pc.add(pc.multiply(pk, 2), 1)
        p2 = p2.combine_chunks() if isinstance(p2, pa.ChunkedArray) else p2
        return pa.table({
            "src": pa.concat_arrays([o2, p2]),
            "dst": pa.concat_arrays([p2, o2]),
        })

    edges = li.map_batches(both, batch_format="pyarrow")
    # 8 shards is the measured local-mode sweet spot (S² ref routing
    # overhead grows quadratically; a multi-node run scales S with nodes)
    with GraphEngine(edges, num_shards=8) as eng:
        return eng.pagerank(iters=5).materialize()


def _pagerank_weighted_sql(iters: int = 5) -> str:
    """Unrolled WEIGHTED PageRank: each node's 85% share splits per unit
    of edge weight — c(edge) = w × ((85·r) // (100·wdeg)), the division
    per NODE first so the engine's int64 arithmetic never overflows and
    the SQL replays it exactly. Every per-round CTE is MATERIALIZED
    (each r_i is referenced twice — inlining would grow 2^iters)."""
    units = 10**15
    parts = [f"""
    WITH e0 AS (SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst,
                       cast(l_quantity as bigint) AS w
                FROM lineitem
                UNION ALL
                SELECT l_partkey*2+1 AS src, l_orderkey*2 AS dst,
                       cast(l_quantity as bigint) AS w
                FROM lineitem),
    e AS MATERIALIZED (SELECT src, dst, cast(sum(w) as bigint) AS w
                       FROM e0 GROUP BY src, dst),
    deg AS (SELECT src AS node, cast(sum(w) as bigint) AS wd
            FROM e GROUP BY src),
    params AS (SELECT count(*) AS n FROM deg),
    r0 AS MATERIALIZED (
        SELECT node, cast({units} // (SELECT n FROM params) AS bigint)
               AS r, wd
        FROM deg)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
    c{i} AS MATERIALIZED (
        SELECT e.dst AS node,
               sum(e.w * ((85 * r{i-1}.r) // (100 * r{i-1}.wd))) AS s
        FROM e JOIN r{i-1} ON e.src = r{i-1}.node GROUP BY e.dst),
    r{i} AS MATERIALIZED (
        SELECT r{i-1}.node,
               cast((SELECT (15 * {units}) // (100 * n) FROM params)
                    + coalesce(c{i}.s, 0) AS bigint) AS r,
               r{i-1}.wd
        FROM r{i-1} LEFT JOIN c{i} ON c{i}.node = r{i-1}.node)""")
    parts.append(f"\n    SELECT node, r FROM r{iters}")
    return "".join(parts)


@register("part_order_pagerank_weighted", _pagerank_weighted_sql(5))
def _q_part_order_pagerank_weighted(sf_dir: str):
    """WEIGHTED entity-popularity prior: PageRank over the order↔part
    graph with edge weight = summed line quantity, so heavily-bought
    links carry proportionally more rank (the quantity-aware version of
    the reference's link-count boost). 5 exact int64 fixed-point
    iterations on the resident edge-shard engine
    (stages/graph_actors.py, ``weight_col`` + ``pagerank(weighted=True)``
    — duplicate edges sum weights at seal, per-iteration exchange stays
    the pre-combined per-dst sums). Value-hash-checked against the
    materialized unrolled weighted-CTE program."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.graph_actors import GraphEngine

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_quantity"])

    def both(b: pa.Table) -> pa.Table:
        ok = pc.multiply(pc.cast(b["l_orderkey"], pa.int64()), 2)
        pk = pc.add(pc.multiply(pc.cast(b["l_partkey"], pa.int64()), 2), 1)
        w = pc.cast(b["l_quantity"], pa.int64())
        ok = ok.combine_chunks() if isinstance(ok, pa.ChunkedArray) else ok
        pk = pk.combine_chunks() if isinstance(pk, pa.ChunkedArray) else pk
        w = w.combine_chunks() if isinstance(w, pa.ChunkedArray) else w
        return pa.table({"src": pa.concat_arrays([ok, pk]),
                         "dst": pa.concat_arrays([pk, ok]),
                         "w": pa.concat_arrays([w, w])})

    edges = li.map_batches(both, batch_format="pyarrow")
    with GraphEngine(edges, num_shards=8, weight_col="w") as eng:
        return eng.pagerank(iters=5, weighted=True).materialize()


@register("event_value_sketch_quantiles")
def _q_event_value_sketch_quantiles(sf_dir: str):
    """APPROXIMATE global quantiles of event value via the mergeable
    equi-weight summary sketch (stages/sketch.approx_quantiles) — the
    scale path beside the exact count-histogram quantiles: bounded
    (sketch_size × 16 B) shuffle payload per block regardless of value
    cardinality. Rows-only BY CONSTRUCTION: the per-block compaction
    makes the estimate a function of the input partitioning, so unlike
    the HLL/k-means estimates it cannot be pinned as VALUES (measured:
    identical values across 4/8-cpu sessions, different at 32 — the
    estimate moved within its rank-error bound when Ray split the read
    into more blocks). The rank-error bound vs the exact quantiles is
    pytest-gated."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.sketch import approx_quantiles

    ev = _read(sf_dir, "events", ["value"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({"cents": pc.cast(
            pc.round(pc.multiply(b["value"], 100.0),
                     round_mode="half_towards_infinity"), pa.int64())})

    return approx_quantiles(ev.map_batches(cents, batch_format="pyarrow"),
                            val_col="cents",
                            qs=(0.25, 0.5, 0.75, 0.95, 0.99))


@register(
    "event_share_of_type",
    """
    SELECT event_id,
           cast((cast(round(value * 100) as bigint) * 1000000)
                // sum(cast(round(value * 100) as bigint))
                     OVER (PARTITION BY event_type) as bigint) AS share_ppm
    FROM events
    """,
)
def _q_event_share_of_type(sf_dir: str):
    """Ratio-to-report window (each event's share of its type's total,
    ppm fixed-point): the totals are a combiner groupby collapsing to
    one row per type — driver-small by key cardinality — broadcast back
    into a pure map; NO per-row shuffle, unlike the naive window-join
    formulation. Integer division matches DuckDB exactly because every
    value is positive (floor == trunc); documented, not assumed."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                      round_mode="half_towards_infinity"),
                             pa.int64()),
        })

    cev = ev.map_batches(cents, batch_format="pyarrow").materialize()

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["event_type", "cents"]).group_by("event_type") \
            .aggregate([("cents", "sum")])
        return g.rename_columns(["event_type", "__t"])

    totals = dict(
        (r["event_type"], r["sum(__t)"])
        for r in (cev.map_batches(partial, batch_format="pyarrow")
                  .groupby("event_type").aggregate(Sum("__t"))
                  .take_all()))  # one row per type — driver-small

    def share(b: pa.Table) -> pa.Table:
        import numpy as np
        t = np.array([totals[x] for x in b["event_type"].to_pylist()],
                     np.int64)
        c = b["cents"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": b["event_id"],
            "share_ppm": pa.array((c * 1_000_000) // t),
        })

    return cev.map_batches(share, batch_format="pyarrow")


def _zorder_sql() -> str:
    """Morton interleave as generated SQL bit terms (bit i of user_id →
    bit 2i, bit i of the hour index → bit 2i+1) — the same key the
    vectorized numpy ladder computes."""
    terms = []
    for i in range(16):
        terms.append(f"((((user_id) >> {i}) & 1) << {2 * i})")
        terms.append(
            f"((((epoch_us(ts) // 3600000000) & 65535) >> {i} & 1)"
            f" << {2 * i + 1})")
    return ("SELECT event_id, cast(" + "\n         + ".join(terms)
            + " as bigint) AS zkey FROM events")


@register("events_zorder_key", _zorder_sql())
def _q_events_zorder_key(sf_dir: str):
    """Z-order (Morton) clustering key over (user_id, hour): the write-
    layout op for 100-TB partitioned output — sorting a partition by
    this key co-locates rows close in BOTH dimensions so row-group
    min/max pruning serves range predicates on either column. Pure
    vectorized bit-spreading (functions/layout.morton2); the oracle is
    the same interleave as 32 generated SQL bit terms."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .functions.layout import morton2

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def key(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us // 3_600_000_000) & 0xFFFF
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": b["event_id"],
            "zkey": pa.array(morton2(uid, hour)),
        })

    return ev.map_batches(key, batch_format="pyarrow")


@register(
    "daily_new_users_cumulative",
    """
    WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS d
               FROM events GROUP BY user_id),
    c AS (SELECT d, count(*) AS n FROM f GROUP BY d)
    SELECT d, n, cast(sum(n) OVER (ORDER BY d) as bigint) AS cum_users
    FROM c
    """,
)
def _q_daily_new_users_cumulative(sf_dir: str):
    """User-acquisition curve: first-seen day per user (combiner Min
    groupby), new users per day (count groupby), then the cumulative
    total via the range-bucketed distributed prefix scan — three
    composed operators, each already scale-shaped; the scan input is one
    row per day, so the final stage is trivially small no matter the
    event volume."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    from .stages.scan import prefix_sum

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        d = pc.multiply(pc.cast(pc.divide(us, pa.scalar(86_400_000_000)),
                                pa.int64()), pa.scalar(86_400_000_000))
        t = pa.table({"user_id": b["user_id"], "__d": d})
        g = t.group_by("user_id").aggregate([("__d", "min")])
        return g.rename_columns(["user_id", "__d"])  # per-batch combiner

    from .stages.agg import bucketed_agg

    first = bucketed_agg(ev.map_batches(day, batch_format="pyarrow"),
                         "user_id", [("__d", "min", "d_us")])

    def cpart(b: pa.Table) -> pa.Table:
        g = b.select(["d_us"]).group_by("d_us") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["d_us", "__n"])

    from ray.data.aggregate import Sum

    per_day = (first.map_batches(cpart, batch_format="pyarrow")
               .groupby("d_us").aggregate(Sum("__n", alias_name="n")))
    scanned = prefix_sum(per_day, order_col="d_us", val_col="n",
                         out_col="cum_users", num_buckets=8)

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "d": pc.cast(b["d_us"], pa.timestamp("us")),
            "n": pc.cast(b["n"], pa.int64()),
            "cum_users": pc.cast(b["cum_users"], pa.int64()),
        })

    return scanned.map_batches(fin, batch_format="pyarrow")


@register(
    "event_type_cooccurrence",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    """,
)
def _q_event_type_cooccurrence(sf_dir: str):
    """Market-basket co-occurrence: for every unordered event-type pair,
    how many users did both. The scale shape: per-batch Arrow distinct
    collapses (user, type) WITHIN each block before the shuffle, one
    coarse user-hash co-group finishes the dedup in-kernel and emits
    each user's type pairs with ONE vectorized segment kernel (k types
    → k·(k-1)/2 rows, k bounded by the type vocabulary), and a
    partial-count combiner feeds the tiny final pair groupby. Bound:
    a group holds ≤ n_types × n_blocks_containing_user rows per user
    (cross-block duplicates survive until the in-kernel dedup) — the
    price of folding the former global-distinct all-to-all into the
    single co-group shuffle, measured worth it at this fan-in."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from .stages.windows import _add_key_bucket

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def dist(b: pa.Table) -> pa.Table:
        return b.group_by(["user_id", "event_type"]).aggregate([])

    # ONE shuffle: batch-local combiner + in-kernel distinct (all rows
    # of a user land in one bucket group) — the dedicated distinct
    # groupby was a second all-to-all on a user-scale key
    pairs_src = (ev.map_batches(dist, batch_format="pyarrow")
                 .map_batches(_add_key_bucket("user_id"),
                              batch_format="pyarrow"))

    def pair_kernel(group: pd.DataFrame) -> pd.DataFrame:
        from .stages.blocking import segment_pairs

        g = group.sort_values(["user_id", "event_type"], kind="mergesort")
        g = g.drop_duplicates(["user_id", "event_type"])
        types = g["event_type"].to_numpy()
        # vectorized within-segment pair generation (shared kernel)
        ai, bi = segment_pairs(g["user_id"].to_numpy())
        out = pd.DataFrame({"type_a": types[ai], "type_b": types[bi]})
        return out.groupby(["type_a", "type_b"], as_index=False) \
            .size().rename(columns={"size": "__n"})  # in-bucket combiner

    return (pairs_src.groupby("__kb")
            .map_groups(pair_kernel, batch_format="pandas")
            .groupby(["type_a", "type_b"])
            .aggregate(Sum("__n", alias_name="n_users")))


@register(
    "part_pair_support",
    """
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS support
    FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b HAVING count(*) >= 2
    """,
)
def _q_part_pair_support(sf_dir: str):
    """Frequent-itemset support counting (the A-priori first pass over
    baskets): unordered part pairs bought together in ≥ 2 orders. Same
    shape as event_type_cooccurrence — per-batch distinct combiner, one
    order-hash co-group emitting each basket's pairs with the vectorized
    segment kernel (baskets hold ≤ 7 parts, so ≤ 21 pairs each) — but
    the pair key space scales with the catalog, so the final count rides
    bucketed_agg instead of a native pair groupby, and the support
    filter prunes before any driver sees a row."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.agg import bucketed_agg
    from .stages.windows import _add_key_bucket

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def dist(b: pa.Table) -> pa.Table:
        return b.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    pairs_src = (li.map_batches(dist, batch_format="pyarrow")
                 .map_batches(_add_key_bucket("l_orderkey"),
                              batch_format="pyarrow"))

    def pair_kernel(group: pd.DataFrame) -> pd.DataFrame:
        from .stages.blocking import segment_pairs

        g = group.sort_values(["l_orderkey", "l_partkey"],
                              kind="mergesort")
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        parts = g["l_partkey"].to_numpy()
        ai, bi = segment_pairs(g["l_orderkey"].to_numpy())
        out = pd.DataFrame({"part_a": parts[ai], "part_b": parts[bi]})
        return out.groupby(["part_a", "part_b"], as_index=False) \
            .size().rename(columns={"size": "__n"})

    counts = bucketed_agg(
        pairs_src.groupby("__kb").map_groups(pair_kernel,
                                             batch_format="pandas"),
        ["part_a", "part_b"], [("__n", "sum", "support")])

    def keep(b: pa.Table) -> pa.Table:
        m = pc.greater_equal(b["support"], 2)
        return pa.table({"part_a": pc.array_filter(b["part_a"], m),
                         "part_b": pc.array_filter(b["part_b"], m),
                         "support": pc.array_filter(b["support"], m)})

    return counts.map_batches(keep, batch_format="pyarrow")


@register(
    "docs_survivorship",
    """
    WITH corpus AS (
      SELECT doc_id, text, n_chars FROM documents
      UNION ALL
      SELECT doc_id + 100000, text, n_chars - 1 FROM documents
      WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 200000, text, n_chars + 1 FROM documents
      WHERE doc_id % 13 = 0)
    SELECT doc_id, n_chars, n_dupes FROM (
      SELECT doc_id, n_chars,
             cast(count(*) OVER (PARTITION BY text) as bigint) AS n_dupes,
             row_number() OVER (PARTITION BY text
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM corpus) t WHERE rn = 1
    """,
)
def _q_docs_survivorship(sf_dir: str):
    """ER survivorship: canonical record per duplicate group (max
    n_chars, tie min doc_id) + group size — stages/dedup.survivorship;
    the text column never shuffles (per-batch combiner collapses each
    block to one slim row per distinct content). The testdata corpus has
    no text duplicates, so the query runs over a deterministically
    AUGMENTED corpus (every 7th doc re-emitted shorter, every 13th
    longer — exercising both the rank argmax and the id tie-break); the
    oracle mirrors the augmentation with UNION ALL."""
    import numpy as np
    import pyarrow as pa

    from .stages.dedup import survivorship

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def variant(offset: int, mod: int, delta: int):
        def f(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            keep = (ids % mod) == 0
            nc = b["n_chars"].to_numpy(zero_copy_only=False)[keep]
            return pa.table({
                "doc_id": pa.array(ids[keep] + offset),
                "text": b["text"].filter(pa.array(keep)),
                "n_chars": pa.array(nc + delta),
            })
        return f

    corpus = (docs
              .union(docs.map_batches(variant(100000, 7, -1),
                                      batch_format="pyarrow"))
              .union(docs.map_batches(variant(200000, 13, 1),
                                      batch_format="pyarrow")))
    return survivorship(corpus)


@register(
    "events_hourly_partitioned_write",
    """
    SELECT event_type, date_trunc('hour', ts) AS hour,
           count(*) AS n,
           sum(cast(round(value * 1000000) as bigint)) / 1000000.0
             AS sum_value
    FROM events
    GROUP BY event_type, hour
    """,
)
def _q_events_hourly_partitioned_write(sf_dir: str):
    """Resumable partitioned output, exercised inside the oracle battery:
    the hourly aggregate is written as hive-partitioned parquet (one
    directory per event_type — the layout a failed 100-TB run resumes
    by skipping complete partitions) and read back; the value-hash
    compare proves the write→read round trip is lossless including the
    partition column."""
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data

    out_dir = tempfile.mkdtemp(prefix="elray_hourly_part_")
    _q_events_hourly(sf_dir).write_parquet(out_dir,
                                           partition_cols=["event_type"])
    back = ray.data.read_parquet(out_dir)

    def fix(b: pa.Table) -> pa.Table:
        # hive partition values come back dictionary-encoded
        return pa.table({
            "event_type": pc.cast(b["event_type"], pa.string()),
            "hour": pc.cast(b["hour"], pa.timestamp("us")),
            "n": pc.cast(b["n"], pa.int64()),
            "sum_value": pc.cast(b["sum_value"], pa.float64()),
        })

    return back.map_batches(fix, batch_format="pyarrow")


@register(
    "knn_ivf_trained_top5",
    """
    SELECT cast(v.query_id AS bigint) AS query_id,
           cast(v.neighbor_id AS bigint) AS neighbor_id,
           cast(v.rank AS bigint) AS rank
    FROM (VALUES
    (6000,0,17,0),(6000,0,225,1),(6000,0,483,2),(6000,0,260,3),(6000,0,212,4),
    (6000,1,209,0),(6000,1,129,1),(6000,1,376,2),(6000,1,455,3),(6000,1,260,4),
    (6000,2,443,0),(6000,2,62,1),(6000,2,91,2),(6000,2,132,3),(6000,2,488,4),
    (6000,3,223,0),(6000,3,205,1),(6000,3,212,2),(6000,3,84,3),(6000,3,156,4),
    (6000,4,98,0),(6000,4,57,1),(6000,4,357,2),(6000,4,62,3),(6000,4,271,4),
    (6000,5,113,0),(6000,5,296,1),(6000,5,360,2),(6000,5,205,3),(6000,5,395,4),
    (6000,6,434,0),(6000,6,78,1),(6000,6,280,2),(6000,6,467,3),(6000,6,495,4),
    (6000,7,382,0),(6000,7,466,1),(6000,7,329,2),(6000,7,167,3),(6000,7,249,4),
    (6000,8,385,0),(6000,8,132,1),(6000,8,142,2),(6000,8,118,3),(6000,8,398,4),
    (6000,9,381,0),(6000,9,107,1),(6000,9,365,2),(6000,9,396,3),(6000,9,463,4),
    (60000,0,334,0),(60000,0,423,1),(60000,0,73,2),(60000,0,190,3),(60000,0,388,4),
    (60000,1,386,0),(60000,1,27,1),(60000,1,64,2),(60000,1,203,3),(60000,1,363,4),
    (60000,2,117,0),(60000,2,450,1),(60000,2,145,2),(60000,2,320,3),(60000,2,418,4),
    (60000,3,343,0),(60000,3,174,1),(60000,3,207,2),(60000,3,437,3),(60000,3,474,4),
    (60000,4,482,0),(60000,4,280,1),(60000,4,249,2),(60000,4,257,3),(60000,4,89,4),
    (60000,5,404,0),(60000,5,419,1),(60000,5,33,2),(60000,5,464,3),(60000,5,453,4),
    (60000,6,350,0),(60000,6,430,1),(60000,6,145,2),(60000,6,395,3),(60000,6,252,4),
    (60000,7,334,0),(60000,7,445,1),(60000,7,221,2),(60000,7,302,3),(60000,7,0,4),
    (60000,8,39,0),(60000,8,138,1),(60000,8,497,2),(60000,8,380,3),(60000,8,173,4),
    (60000,9,49,0),(60000,9,489,1),(60000,9,107,2),(60000,9,256,3),(60000,9,198,4)
    ) AS v(sf_key, query_id, neighbor_id, rank)
    WHERE v.sf_key = (SELECT count(*) FROM lineitem)
    """,
)
def _q_knn_ivf_trained(sf_dir: str):
    """IVF k-NN over TRAINED buckets: distributed Lloyd k-means on
    RESIDENT vector shards (stages/knn.kmeans_fit_actors — vectors ship
    to actors once, each iteration is one slim RPC per shard; exact
    int64 fixed-point reduce, bit-identical to the Dataset-pass
    kmeans_fit, equivalence-tested; A/B at sf0.1: 5.3 s → 2.7 s) feeds
    the same assign → prune → partial-top-k → merge dataflow as
    knn_ivf_top5. k-means has no direct SQL form, but the training is
    exact fixed-point (bit-reproducible), so the full 50-row output is
    PINNED as VALUES at the two correctness scales, keyed by the
    lineitem row count — any drift in training, assignment, pruning or
    merge breaks the value-hash. Pruned-recall and training cohesion
    remain pytest-gated."""
    import numpy as np

    from .stages.knn import ivf_knn, kmeans_fit_actors

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = kmeans_fit_actors(ds, k=16, iters=3)
    head = ds.filter(expr="vec_id < 10").to_pandas().sort_values("vec_id")
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"]])
    out = ivf_knn(ds, Q, head["vec_id"].tolist(), k=5, nprobe=4,
                  centroids=cents)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


@register(
    "doc_chain_clusters",
    """
    WITH RECURSIVE s AS (
      SELECT doc_id, n_chars,
             lag(doc_id) OVER w AS pid,
             lag(n_chars) OVER w AS pch
      FROM documents
      WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)),
    e AS (SELECT pid AS a, doc_id AS b FROM s
          WHERE pid IS NOT NULL AND n_chars - pch <= 2),
    eu AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    rr(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT rr.a, eu.b FROM rr JOIN eu ON rr.b = eu.a)
    SELECT a AS doc_id, cast(min(b) as bigint) AS cluster_id
    FROM rr GROUP BY a
    """,
)
def _q_doc_chain_clusters(sf_dir: str):
    """ORACLED transitive clustering: the flagship's union-find machinery
    (stages/clustering.connected_components — hash-min label propagation
    with pointer jumping) value-hash-checked against a recursive-CTE
    reachability closure in DuckDB. Edges chain documents adjacent in
    per-lang (n_chars, doc_id) order when their lengths differ by ≤ 2 —
    deterministic chain components with real multi-hop transitivity, so
    the min-label has to PROPAGATE, not just copy a direct neighbor.
    Isolated docs are their own cluster (the contract documented on
    connected_components)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from .stages.clustering import connected_components
    from .stages.windows import _add_key_bucket

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]) \
        .materialize()  # two consumers: edge build + singleton join-back

    def chain_edges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], kind="mergesort")
        ids = g["doc_id"].to_numpy(np.int64)
        nc = g["n_chars"].to_numpy(np.int64)
        ok = (nc[1:] - nc[:-1]) <= 2
        return pd.DataFrame({"src": ids[:-1][ok], "dst": ids[1:][ok]})

    edges = docs.groupby("lang").map_groups(chain_edges,
                                            batch_format="pandas")
    labels = connected_components(edges)

    # singleton join-back: docs ∪ labels co-grouped by id (slim tag-union)
    def tag_doc(b: pa.Table) -> pa.Table:
        return pa.table({"k": b["doc_id"],
                         "label": pa.array(np.full(len(b), -1, np.int64)),
                         "__side": pa.array(np.zeros(len(b), np.int8))})

    def tag_label(b: pa.Table) -> pa.Table:
        return pa.table({"k": b["node"], "label": b["label"],
                         "__side": pa.array(np.ones(len(b), np.int8))})

    tagged = (docs.map_batches(tag_doc, batch_format="pyarrow")
              .union(labels.map_batches(tag_label, batch_format="pyarrow"))
              .map_batches(_add_key_bucket("k"), batch_format="pyarrow"))

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        d = group[group["__side"] == 0][["k"]]
        l = group[group["__side"] == 1][["k", "label"]]
        m = d.merge(l, on="k", how="left")
        return pd.DataFrame({
            "doc_id": m["k"].to_numpy(np.int64),
            "cluster_id": m["label"].fillna(m["k"]).to_numpy(np.int64),
        })

    return tagged.groupby("__kb").map_groups(resolve,
                                             batch_format="pandas")


@register(
    "events_hourly_spikes",
    """
    WITH hours AS (
      SELECT unnest(generate_series(
        date_trunc('hour', (SELECT min(ts) FROM events)),
        date_trunc('hour', (SELECT max(ts) FROM events)),
        INTERVAL 1 HOUR)) AS hour),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                      count(*) AS n
               FROM events GROUP BY 1, 2),
    g AS (SELECT t.event_type, h.hour, coalesce(c.n, 0) AS n
          FROM types t CROSS JOIN hours h
          LEFT JOIN counts c ON c.event_type = t.event_type
                            AND c.hour = h.hour)
    SELECT event_type, hour, n,
           cast(coalesce(sum(n) OVER w, 0) as bigint) AS trailing,
           cast(CASE WHEN n * 24 > 2 * coalesce(sum(n) OVER w, 0)
                THEN 1 ELSE 0 END as bigint) AS is_spike
    FROM g
    WINDOW w AS (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    """,
)
def _q_events_hourly_spikes(sf_dir: str):
    """Monitoring-shaped anomaly flags: an hour spikes when its count
    exceeds 2× its trailing-24h per-type average (integer cross-multiply,
    no float surface). Composes gap_fill_counts — the trailing frame is
    over WALL-CLOCK hours, which is exactly why the series must be
    densified first — with the bounded ROWS rolling window; the
    exclusive trailing sum is the inclusive 25-row window minus the
    current row, exact under partial frames too."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.windows import gap_fill_counts, grouped_rolling_window

    ev = _read(sf_dir, "events", ["event_type", "ts"])
    gf = gap_fill_counts(ev, key_col="event_type", ts_col="ts",
                         width_us=3_600_000_000, bucket_col="hour")

    def prep(b: pa.Table) -> pa.Table:
        hid = pc.cast(pc.cast(b["hour"], pa.timestamp("us")), pa.int64())
        return pa.table({"event_type": b["event_type"], "hour": b["hour"],
                         "hid": hid, "n": b["n"]})

    roll = grouped_rolling_window(
        gf.map_batches(prep, batch_format="pyarrow"),
        key_col="event_type", ts_col="hour", id_col="hid", val_col="n",
        window_rows=25, scale=1)

    def fin(b: pa.Table) -> pa.Table:
        n = pc.cast(b["value_units"], pa.int64())
        trailing = pc.subtract(pc.cast(b["win_units"], pa.int64()), n)
        spike = pc.cast(pc.greater(pc.multiply(n, pa.scalar(24)),
                                   pc.multiply(trailing, pa.scalar(2))),
                        pa.int64())
        return pa.table({
            "event_type": b["event_type"],
            "hour": pc.cast(b["t"], pa.timestamp("us")),
            "n": n, "trailing": trailing, "is_spike": spike,
        })

    return roll.map_batches(fin, batch_format="pyarrow")


@register(
    "top_similar_pairs",
    """
    SELECT id_a, id_b, rn FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             cast(row_number() OVER (
               ORDER BY list_cosine_similarity(a.embedding, b.embedding)
                        DESC, a.vec_id, b.vec_id) as bigint) AS rn
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
    WHERE rn <= 20
    """,
)
def _q_top_similar_pairs(sf_dir: str):
    """Threshold-free dedup audit: the 20 globally most-similar embedding
    pairs (stages/knn.top_cosine_pairs) — per-tile-pair local top-k
    tournament over the exact triangle tile join, final merge over
    ≤ k·tiles² partials; the n² pair set never materializes."""
    from .stages.knn import top_cosine_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return top_cosine_pairs(ds, k=20)


@register(
    "user_retention_cohorts",
    """
    WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
          FROM events)
    SELECT f.cohort, datediff('day', f.cohort, a.d) AS day_offset,
           count(*) AS n_users
    FROM f JOIN a USING (user_id)
    GROUP BY 1, 2
    """,
)
def _q_user_retention_cohorts(sf_dir: str):
    """Retention cohort triangle: users bucketed by first-seen day
    (cohort), counted per day-offset of later activity — the canonical
    growth-analytics query. Scale shape: BOTH inputs to the user join
    are already combiner-collapsed aggregates (first-seen via per-batch
    Min partials; activity via per-batch distinct (user, day) pairs), so
    ONE user-bucket co-group (all of a user's rows co-locate) ships the
    slim combined (user, day) pairs once — never raw events — and a
    partial-count combiner feeds the tiny final (cohort, offset)
    groupby."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.windows import _add_key_bucket

    DAY = 86_400_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_pairs(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        d = pc.multiply(pc.cast(pc.divide(us, pa.scalar(DAY)), pa.int64()),
                        pa.scalar(DAY))
        t = pa.table({"user_id": b["user_id"], "d": d})
        return t.group_by(["user_id", "d"]).aggregate([])  # batch distinct

    from .stages.agg import bucketed_agg

    # ONE user-bucket co-group computes everything per user locally
    # (all of a user's rows land in one group): distinct (user, day),
    # first-seen cohort (= segment-min day on the sorted runs), day
    # offsets, and the per-(cohort, offset) partial counts. The former
    # plan shuffled three times (distinct pairs, per-user min, tag-union
    # co-group); this ships the slim combined pairs once.
    src = (ev.map_batches(day_pairs, batch_format="pyarrow")
           .map_batches(_add_key_bucket("user_id"),
                        batch_format="pyarrow"))

    def offsets(group: pa.Table) -> pa.Table:
        u0 = group["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d0 = group["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((d0, u0))
        u, d = u0[o], d0[o]
        n = len(u)
        keep = np.ones(n, dtype=bool)
        if n > 1:  # in-group distinct (user, day)
            keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[keep], d[keep]
        n = len(u)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = u[1:] != u[:-1]
        starts = np.nonzero(new)[0]
        seg = np.cumsum(new) - 1
        cohort = d[starts][seg]  # per-row first-seen day (d sorted/user)
        off = (d - cohort) // DAY
        # in-bucket combiner: one row per (cohort, offset)
        o2 = np.lexsort((off, cohort))
        c2, f2 = cohort[o2], off[o2]
        nb = np.ones(n, dtype=bool)
        if n > 1:
            nb[1:] = (c2[1:] != c2[:-1]) | (f2[1:] != f2[:-1])
        st = np.nonzero(nb)[0]
        return pa.table({
            "cohort": pa.array(c2[st]),
            "day_offset": pa.array(f2[st]),
            "__n": pa.array(np.diff(np.append(st, n)).astype(np.int64)),
        })

    agg = bucketed_agg(
        src.groupby("__kb").map_groups(offsets, batch_format="pyarrow"),
        ["cohort", "day_offset"], [("__n", "sum", "n_users")],
        num_buckets=8)

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "cohort": pc.cast(b["cohort"], pa.timestamp("us")),
            "day_offset": pc.cast(b["day_offset"], pa.int64()),
            "n_users": pc.cast(b["n_users"], pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


@register(
    "part_copurchase_triangles",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    e0 AS (SELECT a.p AS x, b.p AS y FROM lp a
           JOIN lp b ON a.o = b.o AND a.p < b.p),
    e AS (SELECT DISTINCT x, y FROM e0)
    SELECT cast(count(*) as bigint) AS n_triangles
    FROM e e1 JOIN e e2 ON e2.x = e1.y
              JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
    """,
)
def _q_part_copurchase_triangles(sf_dir: str):
    """Exact triangle count over the part co-purchase graph
    (stages/graph.triangle_count): degree-ordered orientation bounds
    wedge volume at O(m^1.5) — the hub-survivable shape — and the whole
    count is one int64, so the 3-way-self-join oracle value-matches
    exactly. Edge build is itself distributed: distinct (order, part)
    combiner, one co-group per order bucket emitting each order's part
    pairs with the vectorized segment kernel (parts-per-order is
    catalog-bounded; the pair explode is quadratic only in that small
    constant)."""
    import numpy as np
    import pyarrow as pa

    from .stages.graph import triangle_count
    from .stages.windows import _add_key_bucket

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def dist(b: pa.Table) -> pa.Table:
        return b.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    # ONE shuffle: the batch-local combiner slims the rows, the order
    # bucket co-group below dedups in-kernel (all rows of an order land
    # in one group) — the former dedicated distinct groupby cost ~7 s of
    # the 16 s wall at sf0.1 (Ray's native multi-key aggregate)
    lp = (li.map_batches(dist, batch_format="pyarrow")
          .map_batches(_add_key_bucket("l_orderkey"),
                       batch_format="pyarrow"))

    def order_pairs(group: pa.Table) -> pa.Table:
        o0 = group["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p0 = group["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((p0, o0))
        o, p = o0[order], p0[order]
        n = len(o)
        keep = np.ones(n, dtype=bool)
        if n > 1:  # in-group distinct (order, part)
            keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
        o, p = o[keep], p[keep]
        n = len(o)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = o[1:] != o[:-1]
        starts = np.nonzero(new)[0]
        cnt = np.diff(np.append(starts, n))
        seg = np.cumsum(new) - 1
        pos = np.arange(n) - starts[seg]
        reps = cnt[seg] - pos - 1
        ai = np.repeat(np.arange(n), reps)
        off = (np.arange(int(reps.sum()))
               - np.repeat(np.concatenate([[0], np.cumsum(reps)[:-1]]),
                           reps) + 1)
        return pa.table({"x": pa.array(p[ai]),
                         "y": pa.array(p[ai + off])})

    edges = lp.groupby("__kb").map_groups(order_pairs,
                                          batch_format="pyarrow")
    # wedge volume scales with m^1.5, not input bytes: floor the bucket
    # count well above the byte-derived width (2 at sf0.1) or the probe
    # kernels serialize on a couple of tasks
    return triangle_count(edges, num_buckets=max(
        32, _table_partitions(sf_dir, "lineitem")))


@register(
    "orders_price_date_skyline",
    """
    WITH t AS (SELECT o_orderkey,
                      cast(round(o_totalprice * 100) as bigint) AS cents,
                      cast(epoch_us(o_orderdate) // 86400000000 as bigint)
                        AS d
               FROM orders)
    SELECT o_orderkey, cents, d FROM t a WHERE NOT EXISTS (
      SELECT 1 FROM t b WHERE b.cents <= a.cents AND b.d <= a.d
        AND (b.cents < a.cents OR b.d < a.d))
    """,
)
def _q_orders_price_date_skyline(sf_dir: str):
    """2-D Pareto frontier (cheapest-earliest orders): each block emits
    its local skyline via a sort + segmented exclusive cummin (dominance
    is transitive, so the global frontier survives every local pass),
    one tiny merge re-applies the kernel — the NOT EXISTS O(n²)
    formulation never runs on the Ray side (stages/rank.skyline_2d)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.rank import skyline_2d

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_totalprice", "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "cents": pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0),
                                      round_mode="half_towards_infinity"),
                             pa.int64()),
            "d": pc.cast(pc.divide(pc.cast(pc.cast(
                b["o_orderdate"], pa.timestamp("us")), pa.int64()),
                pa.scalar(86_400_000_000)), pa.int64()),
        })

    return skyline_2d(orders.map_batches(prep, batch_format="pyarrow"),
                      id_col="o_orderkey", x_col="cents", y_col="d")


@register(
    "part_bfs_hops",
    """
    WITH RECURSIVE e AS (
      SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst FROM lineitem
      UNION
      SELECT l_partkey*2+1 AS src, l_orderkey*2 AS dst FROM lineitem),
    b(node, hop) AS (
      SELECT (SELECT min(l_partkey)*2+1 FROM lineitem) AS node, 0 AS hop
      UNION
      SELECT e.dst, b.hop + 1 FROM b JOIN e ON e.src = b.node
      WHERE b.hop < 4)
    SELECT node, cast(min(hop) as bigint) AS hop FROM b GROUP BY node
    """,
)
def _q_part_bfs_hops(sf_dir: str):
    """Synchronous frontier BFS over the order↔part bipartite graph:
    min hop distance from the lowest-id part, capped at 4 levels — the
    resident edge-shard engine (stages/graph_actors.py; per-level
    exchange is the deduped frontier only, edges never move after the
    build; A/B at sf0.1: 9.8 s shuffle loop → ~1.6 s incl. build),
    value-hash-checked against a recursive-CTE reachability program and
    equivalence-tested against stages/graph.bfs_hops."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    from .stages.graph_actors import GraphEngine

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def both(b: pa.Table) -> pa.Table:
        ok = pc.multiply(pc.cast(b["l_orderkey"], pa.int64()), 2)
        pk = pc.add(pc.multiply(pc.cast(b["l_partkey"], pa.int64()), 2), 1)
        ok = ok.combine_chunks() if isinstance(ok, pa.ChunkedArray) else ok
        pk = pk.combine_chunks() if isinstance(pk, pa.ChunkedArray) else pk
        return pa.table({"src": pa.concat_arrays([ok, pk]),
                         "dst": pa.concat_arrays([pk, ok])})

    seed = 2 * int(li.aggregate(Min("l_partkey"))["min(l_partkey)"]) + 1
    edges = li.map_batches(both, batch_format="pyarrow")
    with GraphEngine(edges, num_shards=8) as eng:
        return eng.bfs(seeds=[seed], max_hops=4).materialize()


def _kcore_sql(k: int, unroll: int) -> str:
    """Unrolled synchronous k-core peeling: surv_{i+1} = nodes whose
    degree WITHIN surv_i is ≥ k — the same wave-simultaneous rule the
    actor engine runs, so the fixpoint is the identical unique k-core.
    ``unroll`` must cover the wave count at the correctness scales
    (measured 5 @ sf0.001 / 9 @ sf0.01 for k=6; pinned by a pytest that
    reads GraphEngine.last_kcore_rounds); extra rounds past the
    fixpoint are no-ops."""
    parts = [f"""
    WITH e0 AS (SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst
                FROM lineitem
                UNION ALL
                SELECT l_partkey*2+1 AS src, l_orderkey*2 AS dst
                FROM lineitem),
    e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0),
    s0 AS (SELECT DISTINCT src AS node FROM e)"""]
    for i in range(1, unroll + 1):
        parts.append(f""",
    s{i} AS MATERIALIZED (SELECT e.src AS node FROM e
             JOIN s{i-1} a ON e.src = a.node
             JOIN s{i-1} b ON e.dst = b.node
             GROUP BY e.src HAVING count(*) >= {k})""")
    parts.append(f"""
    SELECT e.src AS node, count(*) AS core_deg
    FROM e JOIN s{unroll} a ON e.src = a.node
           JOIN s{unroll} b ON e.dst = b.node
    GROUP BY e.src""")
    return "".join(parts)


@register("part_copurchase_kcore", _kcore_sql(6, 16))
def _q_part_copurchase_kcore(sf_dir: str):
    """Dense-community extraction: the 6-core of the undirected-ized
    order↔part co-purchase graph (node + within-core degree) — the
    graph-sparsification step a blocking-graph cleaner runs before
    expensive pairwise scoring. Synchronous distributed peeling on the
    RESIDENT edge-shard engine (stages/graph_actors.py::kcore): edges
    hash-partition once, each wave ships only the victims' pre-combined
    neighbor decrements, so TOTAL exchange over the whole run is
    O(|E|) however many waves it takes. Value-hash-checked against a
    16-round unrolled peeling SQL program (wave-equivalent by
    construction; 9 waves suffice at sf0.01) and equivalence-tested
    against a single-process numpy reference."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.graph_actors import GraphEngine

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def both(b: pa.Table) -> pa.Table:
        ok = pc.multiply(pc.cast(b["l_orderkey"], pa.int64()), 2)
        pk = pc.add(pc.multiply(pc.cast(b["l_partkey"], pa.int64()), 2), 1)
        ok = ok.combine_chunks() if isinstance(ok, pa.ChunkedArray) else ok
        pk = pk.combine_chunks() if isinstance(pk, pa.ChunkedArray) else pk
        return pa.table({"src": pa.concat_arrays([ok, pk]),
                         "dst": pa.concat_arrays([pk, ok])})

    edges = li.map_batches(both, batch_format="pyarrow")
    with GraphEngine(edges, num_shards=8) as eng:
        return eng.kcore(k=6).materialize()


@register(
    "event_value_winsorized",
    """
    WITH q AS (
      SELECT event_type,
             quantile_disc(cast(round(value * 100) as bigint), 0.05) AS lo,
             quantile_disc(cast(round(value * 100) as bigint), 0.95) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           cast(sum(least(greatest(
               cast(round(value * 100) as bigint), lo), hi)) as bigint)
             AS sum_clipped_cents,
           cast(sum(CASE WHEN cast(round(value * 100) as bigint) < lo
                           OR cast(round(value * 100) as bigint) > hi
                    THEN 1 ELSE 0 END) as bigint) AS n_clipped
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
    """,
)
def _q_event_value_winsorized(sf_dir: str):
    """Per-group winsorization (the ML-preprocessing outlier clip): clip
    each value to its type's exact [p05, p95] and report clipped sums +
    clip counts. The per-type bounds come from the count-histogram
    quantile pass (stages/rank.grouped_quantiles — integer-exact
    quantile_disc ranks), land as one tiny row per type, and broadcast
    into a pure clip-and-combine map — the events themselves shuffle
    once as per-type partials, never row-by-row."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .stages.rank import grouped_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"]).materialize()
    bounds = {r["event_type"]: (r["p5_units"], r["p95_units"])
              for r in grouped_quantiles(ev, key_col="event_type",
                                         val_col="value",
                                         qs_pct=(5, 95)).take_all()}

    def clip_partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        types = b["event_type"].to_pylist()
        lo = np.array([bounds[t][0] for t in types], np.int64)
        hi = np.array([bounds[t][1] for t in types], np.int64)
        clipped = np.minimum(np.maximum(cents, lo), hi)
        t = pa.table({
            "event_type": b["event_type"],
            "__s": pa.array(clipped),
            "__k": pa.array(((cents < lo) | (cents > hi))
                            .astype(np.int64)),
        })
        g = t.group_by("event_type").aggregate([("__s", "sum"),
                                                ("__k", "sum")])
        return g.rename_columns(["event_type", "__s", "__k"])

    agg = (ev.map_batches(clip_partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("__s", alias_name="sum_clipped_cents"),
                      Sum("__k", alias_name="n_clipped")))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "sum_clipped_cents": pc.cast(b["sum_clipped_cents"], pa.int64()),
            "n_clipped": pc.cast(b["n_clipped"], pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


@register(
    "event_value_mad_outliers",
    """
    WITH e AS (SELECT event_type,
                      cast(round(value * 100) as bigint) AS cents
               FROM events),
    m AS (SELECT event_type, quantile_disc(cents, 0.5) AS med
          FROM e GROUP BY event_type),
    d AS (SELECT e.event_type, abs(cents - med) AS dev
          FROM e JOIN m USING (event_type)),
    md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
           FROM d GROUP BY event_type)
    SELECT e.event_type,
           cast(m.med as bigint) AS med_cents,
           cast(md.mad as bigint) AS mad_cents,
           cast(sum(CASE WHEN abs(e.cents - m.med) > 3 * md.mad
                    THEN 1 ELSE 0 END) as bigint) AS n_outliers
    FROM e JOIN m USING (event_type) JOIN md USING (event_type)
    GROUP BY e.event_type, m.med, md.mad
    """,
)
def _q_event_value_mad_outliers(sf_dir: str):
    """Robust per-group outlier detection (median absolute deviation —
    the quantile-based robust z-score, immune to the very outliers it
    hunts, unlike mean/stddev): per event_type the exact integer median,
    the MAD, and the count of values beyond 3 MADs. Two count-histogram
    quantile passes (stages/rank.grouped_quantiles — integer quantile_disc
    ranks), each landing one tiny row per type broadcast into the next
    map; the events shuffle only as per-type count partials."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .stages.rank import grouped_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"]).materialize()
    med = {r["event_type"]: int(r["p50_units"])
           for r in grouped_quantiles(ev, key_col="event_type",
                                      val_col="value",
                                      qs_pct=(50,)).take_all()}

    def cents_of(b: pa.Table) -> np.ndarray:
        return pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_numpy(zero_copy_only=False)

    def dev(b: pa.Table) -> pa.Table:
        c = cents_of(b)
        m = np.array([med[t] for t in b["event_type"].to_pylist()],
                     np.int64)
        return pa.table({"event_type": b["event_type"],
                         "dev": pa.array(np.abs(c - m))})

    mad = {r["event_type"]: int(r["p50_units"])
           for r in grouped_quantiles(
               ev.map_batches(dev, batch_format="pyarrow"),
               key_col="event_type", val_col="dev",
               qs_pct=(50,), scale=1).take_all()}

    def flag_partial(b: pa.Table) -> pa.Table:
        c = cents_of(b)
        types = b["event_type"].to_pylist()
        m = np.array([med[t] for t in types], np.int64)
        a = np.array([mad[t] for t in types], np.int64)
        t = pa.table({
            "event_type": b["event_type"],
            "__o": pa.array((np.abs(c - m) > 3 * a).astype(np.int64)),
        })
        g = t.group_by("event_type").aggregate([("__o", "sum")])
        return g.rename_columns(["event_type", "__o"])

    agg = (ev.map_batches(flag_partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("__o", alias_name="n_outliers")))

    def fin(b: pa.Table) -> pa.Table:
        types = b["event_type"].to_pylist()
        return pa.table({
            "event_type": b["event_type"],
            "med_cents": pa.array([med[t] for t in types], pa.int64()),
            "mad_cents": pa.array([mad[t] for t in types], pa.int64()),
            "n_outliers": pc.cast(b["n_outliers"], pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


@register(
    "lineitem_fk_violations",
    """
    WITH live_orders AS (
      SELECT o_orderkey FROM orders WHERE o_orderkey % 97 <> 0)
    SELECT l.l_orderkey, count(*) AS n_lines,
           cast(sum(cast(round(l_extendedprice * 100) as bigint))
                as bigint) AS orphaned_cents
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM live_orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    GROUP BY l.l_orderkey
    """,
)
def _q_lineitem_fk_violations(sf_dir: str):
    """Referential-integrity audit (the data-quality gate every ingest
    pipeline needs): lineitems whose parent order is missing, aggregated
    per orphaned key with the stranded value. The parent side is thinned
    deterministically (every 97th order dropped) so the audit has real
    signal; the probe is the Bloom-prefiltered distributed anti join —
    at 100 TB almost every healthy child row is ruled out by the filter
    and never enters the join shuffle."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .stages.joins import anti_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def live(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderkey": pa.array(k[(k % 97) != 0])})

    orphans = anti_join(li, orders.map_batches(live,
                                               batch_format="pyarrow"),
                        on=("l_orderkey",), right_on=("o_orderkey",),
                        num_partitions=_table_partitions(sf_dir,
                                                         "lineitem"),
                        bloom_bits=1 << 22)

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        t = pa.table({"l_orderkey": b["l_orderkey"], "__c": cents,
                      "__n": pa.array(np.ones(len(b), np.int64))})
        g = t.group_by("l_orderkey").aggregate([("__n", "sum"),
                                                ("__c", "sum")])
        return g.rename_columns(["l_orderkey", "__n", "__c"])

    agg = (orphans.map_batches(partial, batch_format="pyarrow")
           .groupby("l_orderkey")
           .aggregate(Sum("__n", alias_name="n_lines"),
                      Sum("__c", alias_name="orphaned_cents")))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "n_lines": pc.cast(b["n_lines"], pa.int64()),
            "orphaned_cents": pc.cast(b["orphaned_cents"], pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


@register(
    "part_price_neighbor_pairs",
    """
    WITH r AS (SELECT p_partkey,
                      row_number() OVER (
                        ORDER BY cast(round(p_retailprice * 100) as bigint),
                                 p_partkey) AS rk
               FROM part)
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           cast(b.rk - a.rk as bigint) AS dist
    FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk <= 2
    """,
)
def _q_part_price_neighbor_pairs(sf_dir: str):
    """Sorted-neighborhood blocking (Hernández-Stolfo) — the third ER
    blocking family beside hash blocks and LSH bands: candidate pairs
    within a 3-wide window of the global price order, O(n·w) candidates
    by construction. Global positions via the range-partitioned rank
    (no full sort); pair generation is bucket-local with the last w-1
    ranks replicated across the boundary (stages/blocking.
    sorted_neighborhood_pairs)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.blocking import sorted_neighborhood_pairs

    part = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": b["p_partkey"],
            "cents": pc.cast(pc.round(pc.multiply(b["p_retailprice"],
                                                  100.0),
                                      round_mode="half_towards_infinity"),
                             pa.int64()),
        })

    return sorted_neighborhood_pairs(
        part.map_batches(prep, batch_format="pyarrow"),
        val_col="cents", id_col="p_partkey", window=3)


@register(
    "label_embedding_centroids",
    """
    WITH d AS (SELECT unnest(range(1, 65)) AS dim)
    SELECT label, cast(d.dim as bigint) AS dim,
           cast(sum(cast(round(cast(embedding[d.dim] as double)
                               * 1000000) as bigint))
                // count(*) as bigint) AS centroid_units
    FROM embeddings, d
    GROUP BY label, d.dim
    """,
)
def _q_label_embedding_centroids(sf_dir: str):
    """List-column aggregation with a full oracle: per-label embedding
    centroids in exact fixed point, long-form (label × dim rows). The
    Ray side reduces d×8-byte integer sum blobs per label (one combiner
    row per label per block — kmeans_fit's reduce shape); truncating
    division matches SQL `//` on negative sums
    (stages/knn.grouped_vector_centroids)."""
    from .stages.knn import grouped_vector_centroids

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])
    return grouped_vector_centroids(ds, key_col="label")


@register(
    "error_click_value_interp",
    """
    WITH err AS (SELECT event_id, user_id, epoch_us(ts) AS t
                 FROM events WHERE event_type = 'error'),
    probe AS (
      SELECT e.event_id, e.t,
        (SELECT epoch_us(c.ts) FROM events c
         WHERE c.user_id = e.user_id AND c.event_type = 'click'
           AND epoch_us(c.ts) <= e.t
         ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS t0,
        (SELECT cast(round(c.value * 100) as bigint) FROM events c
         WHERE c.user_id = e.user_id AND c.event_type = 'click'
           AND epoch_us(c.ts) <= e.t
         ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS v0,
        (SELECT epoch_us(c.ts) FROM events c
         WHERE c.user_id = e.user_id AND c.event_type = 'click'
           AND epoch_us(c.ts) > e.t
         ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) AS t1,
        (SELECT cast(round(c.value * 100) as bigint) FROM events c
         WHERE c.user_id = e.user_id AND c.event_type = 'click'
           AND epoch_us(c.ts) > e.t
         ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) AS v1
      FROM err e)
    SELECT event_id,
           cast(CASE
             WHEN t0 IS NOT NULL AND t1 IS NOT NULL
               THEN (v0 * (t1 - t) + v1 * (t - t0)) // (t1 - t0)
             WHEN t0 IS NOT NULL THEN v0
             WHEN t1 IS NOT NULL THEN v1
             ELSE -1 END as bigint) AS v_interp
    FROM probe
    """,
)
def _q_error_click_value_interp(sf_dir: str):
    """Time-series alignment/resampling: each error event gets the click
    value linearly interpolated at its timestamp between the user's
    surrounding clicks — exact int64 arithmetic over fixed-point cents
    and epoch-µs, so even the interpolated values hash-match the SQL
    (stages/joins.interpolate_asof: one slim tag-union co-group,
    hold-last / backfill / sentinel edge rules)."""
    from .stages.joins import interpolate_asof

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type", "value"])
    errors = ev.filter(expr="event_type == 'error'")
    clicks = ev.filter(expr="event_type == 'click'")
    return interpolate_asof(errors, clicks, key="user_id", ts="ts",
                            left_id="event_id", right_id="event_id",
                            right_val="value")


@register("doc_compression_ratio")
def _q_doc_compression_ratio(sf_dir: str):
    """Compression-ratio quality signal (zlib level 6): the standard
    corpus-filtering heuristic beside the Gopher repetition stats —
    boilerplate compresses far below prose. Pure per-batch map (the
    compress loop is C-speed per row); rows-only by nature (SQL has no
    DEFLATE), distribution pinned in pytest."""
    from .functions.textstats import compression_ratio_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(compression_ratio_stats,
                            batch_format="pyarrow")


@register(
    "doc_compression_pinned",
    """
    SELECT CAST(v.doc_id AS BIGINT) AS doc_id,
           strlen((SELECT d.text FROM documents d WHERE d.doc_id = v.doc_id))
               AS raw_len,
           CAST(v.compressed_len AS BIGINT) AS compressed_len,
           CAST(v.ratio_pct AS BIGINT) AS ratio_pct,
           CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs
    FROM (VALUES (6000,0,90,70),(6000,1,189,42),(6000,2,169,48),
                 (6000,3,149,53),(6000,4,112,63),
                 (60000,0,99,63),(60000,1,181,44),(60000,2,133,54),
                 (60000,3,99,67),(60000,4,139,55))
         AS v(sf_key, doc_id, compressed_len, ratio_pct)
    WHERE v.sf_key = (SELECT count(*) FROM lineitem)
    """,
)
def _q_doc_compression_pinned(sf_dir: str):
    """Structural oracle for the zlib compression-ratio signal: the full
    distributed pass runs, then the five smallest doc_ids are checked
    against pinned DEFLATE sizes (zlib level 6 is deterministic), the
    raw_len against the LIVE documents view, and the total row count.
    The full per-doc output stays rows-only (`doc_compression_ratio`)."""
    import numpy as np

    full = QUERIES["doc_compression_ratio"](sf_dir).materialize()
    n_docs = full.count()
    pinned = (full.filter(expr="doc_id < 5").to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    pinned["n_docs"] = np.int64(n_docs)
    return pinned[["doc_id", "raw_len", "compressed_len", "ratio_pct",
                   "n_docs"]]


@register(
    "events_hourly_incremental",
    """
    SELECT event_type, date_trunc('hour', ts) AS hour,
           count(*) AS n,
           sum(cast(round(value * 1000000) as bigint)) / 1000000.0
             AS sum_value
    FROM events
    GROUP BY event_type, hour
    """,
)
def _q_events_hourly_incremental(sf_dir: str):
    """Incremental aggregation with persisted state-merge — the nightly
    ETL shape: the stream arrives in two batches (split by event_id
    parity standing in for two ingest days); batch 1's aggregate STATE
    is written to partitioned parquet (the resumable checkpoint), read
    back, and merged with batch 2's partials by a second combiner
    groupby. Because the per-(type, hour) state is (count, fixed-point
    sum) — a commutative monoid — the merged result is value-hash
    IDENTICAL to the one-shot batch aggregate, and the oracle IS the
    batch formulation: the equivalence is what the driver verifies."""
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data

    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events",
               ["event_id", "event_type", "ts", "value"]).materialize()

    def half(parity: int):
        def f(b: pa.Table) -> pa.Table:
            keep = (b["event_id"].to_numpy(zero_copy_only=False)
                    % 2) == parity
            return b.filter(pa.array(keep))
        return f

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": b["event_type"],
            "hour": pc.floor_temporal(b["ts"], unit="hour"),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "sum_fx": pc.cast(
                pc.round(pc.multiply(b["value"], 1_000_000.0),
                         round_mode="half_towards_infinity"), pa.int64()),
        })
        g = t.group_by(["event_type", "hour"]).aggregate(
            [("n", "sum"), ("sum_fx", "sum")])
        return g.rename_columns(["event_type", "hour", "n", "sum_fx"])

    def agg(ds):
        return (ds.map_batches(partials, batch_format="pyarrow")
                .groupby(["event_type", "hour"])
                .aggregate(Sum("n", alias_name="n"),
                           Sum("sum_fx", alias_name="sum_fx")))

    # day 1: aggregate and persist the state (the resumable checkpoint)
    state_dir = tempfile.mkdtemp(prefix="elray_hourly_state_")
    agg(ev.map_batches(half(0), batch_format="pyarrow")) \
        .write_parquet(state_dir, partition_cols=["event_type"])

    # day 2: read the state back, merge with the new batch's partials
    state = ray.data.read_parquet(state_dir)

    def fix_state(b: pa.Table) -> pa.Table:  # hive col returns dictionary
        return pa.table({
            "event_type": pc.cast(b["event_type"], pa.string()),
            "hour": pc.cast(b["hour"], pa.timestamp("us")),
            "n": pc.cast(b["n"], pa.int64()),
            "sum_fx": pc.cast(b["sum_fx"], pa.int64()),
        })

    day2 = (ev.map_batches(half(1), batch_format="pyarrow")
            .map_batches(partials, batch_format="pyarrow"))
    merged = (state.map_batches(fix_state, batch_format="pyarrow")
              .union(day2)
              .groupby(["event_type", "hour"])
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sum_fx", alias_name="sum_fx")))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "hour": pc.cast(b["hour"], pa.timestamp("us")),
            "n": pc.cast(b["n"], pa.int64()),
            "sum_value": pc.divide(pc.cast(b["sum_fx"], pa.float64()),
                                   1_000_000.0),
        })

    return merged.map_batches(fin, batch_format="pyarrow")


@register(
    "er_blocking_metrics",
    """
    SELECT CAST(1600 AS BIGINT) AS n_mentions,
           CAST(84289 AS BIGINT) AS cand_pairs,
           CAST(934109 AS BIGINT) AS reduction_ppm,
           CAST(9577 AS BIGINT) AS gold_pairs,
           CAST(632139 AS BIGINT) AS completeness_ppm
    """,
)
def _q_er_blocking_metrics(sf_dir: str):
    """Blocking-quality report for the flagship's primary (surface-hash)
    blocking family: reduction ratio (candidate pairs vs all pairs) and
    pairs completeness (gold same-entity pairs whose mentions share a
    block) — the two standard ER blocking metrics, in ppm fixed point.
    Runs on the deterministic gold corpus (the labeled fixture the F1
    gate uses — sf-independent by design, like the recall benchmarks);
    the report is a deterministic constant, so the oracle pins it as a
    VALUES row (also pinned in pytest). Both metrics are computed with combiner-shaped
    groupbys: per-block counts give Σ n·(n-1)/2 candidates without
    materializing pairs, and gold-pair coverage groups the gold table by
    (entity, block) — no quadratic pass anywhere."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from .corpus import make_corpus
    from .functions.normalize import normalize_str
    from .stages.mentions import extract_mentions

    c = make_corpus()
    aliases = [a for al in c["entities"]["aliases"].to_pylist()
               for a in (al or [])]
    aliases += c["entities"]["subject"].to_pylist()
    mentions = extract_mentions(ray.data.from_arrow(c["documents"]),
                                aliases, concurrency=2)

    def block_counts(b: pa.Table) -> pa.Table:
        t = b.select(["norm_mention"]).group_by("norm_mention") \
            .aggregate([([], "count_all")])
        return t.rename_columns(["block", "__n"])

    from ray.data.aggregate import Sum

    counts = (mentions.map_batches(block_counts, batch_format="pyarrow")
              .groupby("block").aggregate(Sum("__n", alias_name="n"))
              .to_pandas())  # one row per block — driver-small fixture
    n_mentions = int(counts["n"].sum())
    cand_pairs = int((counts["n"] * (counts["n"] - 1) // 2).sum())
    all_pairs = n_mentions * (n_mentions - 1) // 2

    # gold same-entity pairs + how many share a block (same normalized
    # surface): group gold by (entity, block) — combiner-shaped
    g = c["mentions_gold"].to_pandas()
    g = g[g["entity_id"] != "NIL"].copy()
    g["block"] = [normalize_str(m) for m in g["mention"]]
    per_ent = g.groupby("entity_id").size()
    gold_pairs = int((per_ent * (per_ent - 1) // 2).sum())
    per_eb = g.groupby(["entity_id", "block"]).size()
    covered = int((per_eb * (per_eb - 1) // 2).sum())

    return pa.table({
        "n_mentions": pa.array([n_mentions], pa.int64()),
        "cand_pairs": pa.array([cand_pairs], pa.int64()),
        "reduction_ppm": pa.array(
            [1_000_000 - (cand_pairs * 1_000_000) // max(all_pairs, 1)],
            pa.int64()),
        "gold_pairs": pa.array([gold_pairs], pa.int64()),
        "completeness_ppm": pa.array(
            [(covered * 1_000_000) // max(gold_pairs, 1)], pa.int64()),
    })


@register(
    "candidates_lexical",
    """
    WITH dt AS (SELECT DISTINCT doc_id, t.token
                FROM documents, unnest(string_split(text, ' ')) AS t(token)
                WHERE t.token <> ''),
    pt AS (SELECT DISTINCT p_partkey, t.token
           FROM part, unnest(string_split(p_name, ' ')) AS t(token)
           WHERE t.token <> ''),
    df AS (SELECT token, count(*) AS df FROM pt GROUP BY token),
    w AS (SELECT token,
                 cast(round(ln((SELECT count(*) FROM part)
                               / cast(df AS double)) * 1000000) AS bigint)
                 AS units
          FROM df),
    sc AS (SELECT dt.doc_id, pt.p_partkey,
                  cast(sum(w.units) as bigint) AS score_units
           FROM dt JOIN pt USING (token) JOIN w USING (token)
           GROUP BY dt.doc_id, pt.p_partkey),
    r AS (SELECT doc_id, p_partkey, score_units,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score_units DESC, p_partkey)
                 AS rn
          FROM sc)
    SELECT doc_id, p_partkey, score_units, cast(rn as bigint) AS rn
    FROM r WHERE rn <= 5
    """,
)
def _q_candidates_lexical(sf_dir: str):
    """Lexical (BM25-style) candidate retrieval — the reference's Solr
    channel (candidate_generators.py:59-116, query template
    main_solr.py:127-137) as a deterministic inverted-index operator:
    documents score the part catalog by summed fixed-point idf units
    over shared tokens, top-5 per doc (stages/lexical.py; broadcast
    postings — entities ≪ corpus — with an equivalence-tested
    distributed-join plan past the cap). Exact DuckDB value-hash oracle
    (set-semantics scoring, int64 sums)."""
    import numpy as np
    import pyarrow.parquet as pq

    from .stages.lexical import lexical_topk

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    return lexical_topk(
        docs, entity_ids=part["p_partkey"].to_numpy().astype(np.int64),
        entity_texts=part["p_name"].to_pylist(), k=5,
        out_entity_col="p_partkey")


def _fingerprint_pinned(sf_dir: str, full_name: str, val_col: str):
    """Shared shape for the pinned-fingerprint audits: full distributed
    fingerprint pass → (5 pinned rows, total count, distinct count).
    Driver-bounded: only the 5 pinned rows and two scalars collect."""
    import numpy as np
    import pyarrow as pa

    full = QUERIES[full_name](sf_dir).materialize()
    n_docs = full.count()

    from .stages.agg import bucketed_agg

    n_distinct = bucketed_agg(full.select_columns([val_col]),
                              val_col).count()
    pinned = (full.filter(expr="doc_id < 5").to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    pinned["n_docs"] = np.int64(n_docs)
    pinned["n_distinct"] = np.int64(n_distinct)
    return pinned[["doc_id", val_col, "n_docs", "n_distinct"]]


@register(
    "doc_fingerprints_pinned",
    """
    SELECT cast(v.doc_id AS bigint) AS doc_id,
           cast(v.fingerprint AS bigint) AS fingerprint,
           cast((SELECT count(*) FROM documents) AS bigint) AS n_docs,
           cast(v.n_distinct AS bigint) AS n_distinct
    FROM (VALUES (60000, 0, 84267257760935643, 436),
                 (60000, 1, 43184800953610647, 436),
                 (60000, 2, 43885770315337477, 436),
                 (60000, 3, 169268781903578623, 436),
                 (60000, 4, 45554909090910364, 436),
                 (6000, 0, 413675588969327546, 438),
                 (6000, 1, 41780763260009847, 438),
                 (6000, 2, 1326713314517409, 438),
                 (6000, 3, 226586947956624591, 438),
                 (6000, 4, 46763879515025180, 438))
         AS v(sf_key, doc_id, fingerprint, n_distinct)
    WHERE v.sf_key = (SELECT count(*) FROM lineitem)
    """,
)
def _q_doc_fingerprints_pinned(sf_dir: str):
    """Structural oracle for the winnowing rolling-hash fingerprints
    (round-5 VERDICT #5): the 64-bit hash itself is not SQL-expressible,
    so the oracle pins (a) the fingerprints of the five smallest doc_ids
    as VALUES literals (computed once at the two correctness scales —
    sf0.001 for the local harness, sf0.01 for the driver — keyed by the
    lineitem row count and held fixed: any change to the hash breaks
    the match), (b) the live row count from the documents view, and
    (c) the distinct-fingerprint count. The full per-doc output remains
    the rows-only `doc_fingerprints` query."""
    return _fingerprint_pinned(sf_dir, "doc_fingerprints", "fingerprint")


@register(
    "simhash_fingerprints_pinned",
    """
    SELECT cast(v.doc_id AS bigint) AS doc_id,
           cast(v.simhash AS bigint) AS simhash,
           cast((SELECT count(*) FROM documents) AS bigint) AS n_docs,
           cast(v.n_distinct AS bigint) AS n_distinct
    FROM (VALUES (60000, 0, -1612229081215695330, 497),
                 (60000, 1, -6077547420272508370, 497),
                 (60000, 2, -8527508649287937526, 497),
                 (60000, 3, -4924363604832038134, 497),
                 (60000, 4, -5148401548021521844, 497),
                 (6000, 0, -5065611340688928242, 495),
                 (6000, 1, -4924365133840408018, 495),
                 (6000, 2, -5062832740567883250, 495),
                 (6000, 3, -4978389835256519154, 495),
                 (6000, 4, -6131355672483028370, 495))
         AS v(sf_key, doc_id, simhash, n_distinct)
    WHERE v.sf_key = (SELECT count(*) FROM lineitem)
    """,
)
def _q_simhash_fingerprints_pinned(sf_dir: str):
    """Structural oracle for the SimHash fingerprints — same pinning
    scheme as `doc_fingerprints_pinned` (VALUES literals at sf0.01 +
    live count + distinct count); the full output stays rows-only."""
    return _fingerprint_pinned(sf_dir, "simhash_fingerprints", "simhash")


@register(
    "embeddings_semdedup_pairs",
    """
    SELECT cast(v.id_a AS bigint) AS id_a,
           cast(v.id_b AS bigint) AS id_b,
           cast(v.cid AS bigint) AS cid
    FROM (VALUES
    (6000,41,56,6),(6000,44,472,6),(6000,50,73,0),(6000,52,322,2),
    (6000,53,134,3),(6000,54,165,4),(6000,60,496,2),(6000,64,455,5),
    (6000,65,292,3),(6000,80,455,5),(6000,85,227,3),(6000,93,243,0),
    (6000,119,403,5),(6000,159,384,1),(6000,165,215,4),(6000,193,243,0),
    (6000,215,462,4),(6000,256,355,5),(6000,319,362,7),(6000,322,397,2),
    (6000,329,361,6),(6000,352,411,0),(6000,365,429,4),(6000,372,418,2),
    (6000,397,471,2),
    (60000,7,340,4),(60000,45,298,5),(60000,53,234,3),(60000,53,300,3),
    (60000,53,430,3),(60000,70,210,2),(60000,75,256,7),(60000,131,456,1),
    (60000,159,202,3),(60000,195,317,4),(60000,198,468,0),(60000,200,204,7),
    (60000,202,245,3),(60000,207,326,2),(60000,234,384,3),(60000,269,340,4),
    (60000,350,395,3)
    ) AS v(sf_key, id_a, id_b, cid)
    WHERE v.sf_key = (SELECT count(*) FROM lineitem)
    """,
)
def _q_semdedup_pairs(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) semantic near-dup pairs: exact
    fixed-point k-means clusters the embedding space (bit-reproducible
    — stages/knn.kmeans_fit_actors), cosine runs ONLY within clusters
    (work Σ c_i², never n²; k is the scale knob), rows id-sorted per
    cluster so every dot product sees identical operands regardless of
    partitioning. k-means has no SQL form, so the full deterministic
    output is PINNED as VALUES at the two correctness scales keyed by
    the lineitem count — drift in training, assignment, tiling or the
    pair emit breaks the value-hash. Within-cluster recall vs the
    brute-force pair set is pytest-gated (found ⊆ brute)."""
    from .stages.dedup import semdedup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semdedup_pairs(ds, k=8, cosine_threshold=0.4)


@register(
    "embeddings_semdedup_keep",
    """
    SELECT e.vec_id, cast(e.label AS int) AS label
    FROM embeddings e
    WHERE e.vec_id NOT IN (
      SELECT v.loser FROM (VALUES
      (6000,56),(6000,73),(6000,80),(6000,134),(6000,165),(6000,193),
      (6000,215),(6000,227),(6000,243),(6000,292),(6000,322),(6000,355),
      (6000,361),(6000,362),(6000,384),(6000,397),(6000,403),(6000,411),
      (6000,418),(6000,429),(6000,455),(6000,462),(6000,471),(6000,472),
      (6000,496),
      (60000,202),(60000,204),(60000,210),(60000,234),(60000,245),
      (60000,256),(60000,269),(60000,298),(60000,300),(60000,317),
      (60000,326),(60000,340),(60000,384),(60000,395),(60000,430),
      (60000,456),(60000,468)
      ) AS v(sf_key, loser)
      WHERE v.sf_key = (SELECT count(*) FROM lineitem))
    """,
)
def _q_semdedup_keep(sf_dir: str):
    """SemDeDup keep-set end-to-end: pairs → connected components →
    min-id winner per component → losers removed by the keyed anti join
    (stages/dedup.semdedup; the vector column rides the join packed as
    binary — Acero rejects list<float> payloads). The oracle pins the
    LOSER ids (small by construction) and re-derives the keep-set from
    the live embeddings view, so the row count scales with the input
    while the dropped set stays exact."""
    from .stages.dedup import semdedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return semdedup(ds, k=8, cosine_threshold=0.4).select_columns(
        ["vec_id", "label"])


def _mixture_sql() -> str:
    from .oracles import MASK63, fnv1a_sql

    return f"""
    WITH tok AS (
      SELECT doc_id, source,
             cast(len(string_split(text, ' ')) AS bigint) AS n_tokens
      FROM documents),
    tot AS (
      SELECT source, cast(sum(n_tokens) AS bigint) AS total
      FROM tok GROUP BY source),
    bud AS (
      SELECT * FROM (VALUES
        ('src0', 500), ('src1', 500), ('src2', 500), ('src3', 500),
        ('src4', 500), ('src5', 100000), ('src6', 100000),
        ('src7', 100000), ('src8', 100000), ('src9', 100000)
      ) b(source, budget)),
    th AS (
      SELECT t.source,
             cast(CASE WHEN b.budget IS NULL THEN 1000000
                  ELSE least(1000000,
                             cast(b.budget AS bigint) * 1000000 // t.total)
                  END AS bigint) AS thresh
      FROM tot t LEFT JOIN bud b ON t.source = b.source)
    SELECT k.doc_id, k.source, k.n_tokens
    FROM tok k JOIN th ON k.source = th.source
    WHERE ({fnv1a_sql("CAST(k.doc_id AS VARCHAR)")} & {MASK63})
          % 1000000 < th.thresh
    """


@register("docs_mixture_sample", _mixture_sql())
def _q_mixture_sample(sf_dir: str):
    """Token-budget mixture sampling (pipelines/train_prep.
    mixture_sample_tokens): srcs 0-4 budgeted at 500 tokens (real
    down-sampling at every sf), 5-9 at 100k (clamps to keep-all), 10-19
    unbudgeted (kept whole) — all three branches exercised. Thresholds
    derive from live per-source token totals, so the same SQL is exact
    at every scale; the keep decision is the FNV-1a hash-bucket rule
    replicated bit-exactly by the oracle (oracles.py)."""
    from .pipelines.train_prep import mixture_sample_tokens

    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    budgets = {f"src{i}": 500 for i in range(5)}
    budgets.update({f"src{i}": 100_000 for i in range(5, 10)})
    return mixture_sample_tokens(docs, budgets).select_columns(
        ["doc_id", "source", "n_tokens"])


# ---------------------------------------------------------------------------
# Line-level boilerplate dedup (CCNet/C4-style corpus scrub)
# ---------------------------------------------------------------------------

_LINE_DEDUP_SQL = """
    WITH corpus AS (
      SELECT doc_id,
             text || chr(10) || 'subscribe to our newsletter' || chr(10)
                  || substr(text, 1, 40) AS t
      FROM documents
    ),
    ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM corpus),
    lines AS (
      SELECT doc_id, unnest(l) AS line, unnest(range(1, len(l) + 1)) AS ord
      FROM ls
    ),
    counts AS (SELECT line, count(*) AS n FROM lines GROUP BY line),
    kept AS (
      SELECT l.doc_id, l.line, l.ord
      FROM lines l JOIN counts c USING (line) WHERE c.n < 2
    ),
    agg AS (
      SELECT doc_id, count(*) AS kept_lines,
             string_agg(line, chr(10) ORDER BY ord) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT ls.doc_id,
           coalesce(a.kept_lines, 0) AS kept_lines,
           len(ls.l) - coalesce(a.kept_lines, 0) AS dropped_lines,
           coalesce(a.clean_text, '') AS clean_text
    FROM ls LEFT JOIN agg a USING (doc_id)
"""


@register("docs_line_dedup", _LINE_DEDUP_SQL)
def _q_docs_line_dedup(sf_dir: str):
    """Corpus-wide line-level boilerplate scrub (stages/dedup.line_dedup;
    CCNet/C4-style): every occurrence of a line duplicated across the
    corpus is removed from every document, per-doc clean_text preserving
    surviving-line order. The testdata documents are single-line, so the
    query derives a deterministic 3-line corpus both sides build
    identically: body + a shared footer (dropped everywhere) + the
    40-char body prefix (dropped exactly where prefixes collide).
    Dispatch (broadcast vs keyed join) follows the duplicated-line count;
    the two paths are equivalence-tested in tests/test_dedup.py."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.dedup import line_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def corpus(b: pa.Table) -> pa.Table:
        t = pc.binary_join_element_wise(
            b["text"], "subscribe to our newsletter",
            pc.utf8_slice_codeunits(b["text"], 0, 40), "\n")
        return pa.table({"doc_id": b["doc_id"], "text": t})

    return line_dedup(docs.map_batches(corpus, batch_format="pyarrow"),
                      min_count=2)


_DUP_SUBSTR_SQL = """
    WITH w AS (
      SELECT doc_id, unnest(range(1, greatest(length(text) - 38, 1))) AS p,
             text
      FROM documents),
    w2 AS (SELECT doc_id, p, substr(text, cast(p as int), 40) AS win FROM w),
    dw AS (SELECT win FROM w2 GROUP BY win HAVING count(*) >= 2),
    hits AS (SELECT doc_id, p FROM w2 WHERE win IN (SELECT win FROM dw)),
    s AS (SELECT doc_id, p,
            CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                 OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 40
            THEN 1 ELSE 0 END AS brk
          FROM hits),
    i AS (SELECT doc_id, p,
            sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS isl FROM s)
    SELECT doc_id, cast(min(p) - 1 as bigint) AS span_start,
           cast(max(p) + 39 as bigint) AS span_end
    FROM i GROUP BY doc_id, isl
"""


@register("docs_dup_substring_spans", _DUP_SUBSTR_SQL)
def _q_docs_dup_substring_spans(sf_dir: str):
    """Exact duplicate-substring spans (ExactSubstr, Lee et al. 2022):
    maximal 0-based character spans covered by any 40-char substring
    occurring >= 2 times corpus-wide — the substring-level complement of
    docs_line_dedup (stages/dedup.dup_substring_spans). One rolling-hash
    count pass (per-block np.unique combiner, 256-bucket merge), then
    the duplicated-hash set broadcasts and every block marks its own
    windows in place — text never re-ships; a slim semi-join plan takes
    over past the 50M-hash cap (equivalence-tested). The oracle compares
    exact substrings, so a 63-bit collision (p ~ 2^-63/pair) would show
    up as a value-hash mismatch — none does."""
    from .stages.dedup import dup_substring_spans

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dup_substring_spans(docs, window=40, min_count=2)


_DOC_CHUNKS_SQL = """
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
    k AS (SELECT doc_id, text, n,
            unnest(range(0, 1 + (greatest(n - 200, 0) + 159) // 160)) AS k
          FROM d)
    SELECT doc_id, cast(k as bigint) AS chunk_idx,
           cast(k * 160 as bigint) AS chunk_start,
           cast(least(k * 160 + 200, n) as bigint) AS chunk_end,
           substr(text, cast(k * 160 + 1 as int),
                  cast(least(k * 160 + 200, n) - k * 160 as int))
             AS chunk_text
    FROM k
"""


@register("doc_chunks", _DOC_CHUNKS_SQL)
def _q_doc_chunks(sf_dir: str):
    """Sliding-window document chunking (size 200 chars, overlap 40 —
    stages/chunking.chunk_documents): the context-window prep stage
    feeding embedding/packing. Integer chunk grid (no float ceil) so
    the SQL replicates it bit-exactly; chunk strings gather out of one
    concatenated batch buffer with numpy fancy indexing on the ASCII
    fast path — no per-chunk Python."""
    from .stages.chunking import chunk_documents

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(docs, size=200, overlap=40)
