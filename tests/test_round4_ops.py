"""Round-4 operators: fuzzy blocked similarity join, funnel conversion,
grouped mode, global NTILE, and SQL set operations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data


def test_fuzzy_value_pairs_blocked_levenshtein(ray_session):
    from entity_linking_ray.stages.fuzzy import fuzzy_value_pairs

    names = ["cold ring", "old ring", "red ring", "cold bolt", "old bolt",
             "blue widget", "blue widget", "cold ring"]  # dups collapse
    ds = ray.data.from_arrow(pa.table({"p_name": pa.array(names)})).repartition(3)
    out = fuzzy_value_pairs(ds, col="p_name", max_dist=2).to_pandas()
    got = {(r.name_a, r.name_b): r.dist for r in out.itertuples()}
    # within-block (last token) pairs at distance <= 2
    assert got[("cold ring", "old ring")] == 1
    assert got[("old ring", "red ring")] == 2
    assert got[("cold bolt", "old bolt")] == 1
    # cross-block (ring vs bolt) and distance-3 (cold vs red) never pair
    assert ("cold ring", "red ring") not in got  # dist 3 > max_dist
    assert not any("bolt" in a and "ring" in b for a, b in got)
    # distinct: the duplicated names produce each pair once
    assert len(out) == len(got)


def test_fuzzy_value_pairs_block_cap_fails_loudly(ray_session):
    from entity_linking_ray.stages.fuzzy import fuzzy_value_pairs

    names = [f"x{i} same" for i in range(30)]
    ds = ray.data.from_arrow(pa.table({"n": pa.array(names)}))
    with pytest.raises(ValueError, match="max_block_values"):
        fuzzy_value_pairs(ds, col="n", max_dist=2,
                          max_block_values=10).count()


def test_funnel_conversion_strict_order(ray_session):
    from entity_linking_ray.stages.windows import funnel_conversion

    rows = []
    # u1 converts: view(10) < click(20) < purchase(30); extra later view
    for t, ty in [(10, "view"), (20, "click"), (30, "purchase"),
                  (40, "view")]:
        rows.append(("u1", t, ty))
    # u2 out of order: click before view
    for t, ty in [(10, "click"), (20, "view"), (30, "purchase")]:
        rows.append(("u2", t, ty))
    # u3 incomplete: no purchase
    for t, ty in [(10, "view"), (20, "click"), (25, "error")]:
        rows.append(("u3", t, ty))
    # u4 ties: view and click at the same instant -> NOT strictly ordered
    for t, ty in [(10, "view"), (10, "click"), (30, "purchase")]:
        rows.append(("u4", t, ty))
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    })
    out = funnel_conversion(
        ray.data.from_arrow(tbl).repartition(3),
        steps=["view", "click", "purchase"]).to_pandas()
    got = out.set_index("user_id")
    assert got.loc["u1", "converted"] == 1 and got.loc["u1", "n_steps"] == 3
    assert got.loc["u2", "converted"] == 0 and got.loc["u2", "n_steps"] == 3
    assert got.loc["u3", "converted"] == 0 and got.loc["u3", "n_steps"] == 2
    assert got.loc["u4", "converted"] == 0


def test_grouped_mode_ties_take_smallest(ray_session):
    from entity_linking_ray.stages.sketch import grouped_mode

    rows = [("a", "x")] * 3 + [("a", "y")] * 2 + \
           [("b", "p")] * 2 + [("b", "q")] * 2 + [("c", "z")]
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows]),
        "v": pa.array([r[1] for r in rows]),
    })).repartition(4)
    out = grouped_mode(ds, key_col="k", val_col="v").to_pandas()
    got = out.set_index("k")
    assert got.loc["a", "mode_val"] == "x" and got.loc["a", "n"] == 3
    assert got.loc["b", "mode_val"] == "p" and got.loc["b", "n"] == 2  # tie
    assert got.loc["c", "mode_val"] == "z" and got.loc["c", "n"] == 1


def test_global_ntile_matches_sql_remainder_rule(ray_session):
    import duckdb

    from entity_linking_ray.stages.scan import global_ntile

    rng = np.random.default_rng(5)
    n, k = 103, 8  # 103 % 8 = 7 big buckets of 13, one of 12
    t = pa.table({"rid": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(rng.integers(0, 50, n), pa.int64())})
    out = global_ntile(ray.data.from_arrow(t).repartition(4),
                       val_col="v", id_col="rid", k=k).to_pandas()
    want = duckdb.connect().execute(
        "SELECT rid, ntile(8) OVER (ORDER BY v, rid) AS tile FROM t"
    ).df()
    got = out.set_index("rid")["tile"]
    w = want.set_index("rid")["tile"]
    assert (got.loc[w.index].to_numpy() == w.to_numpy()).all()


def test_set_ops_match_sql(ray_session):
    from entity_linking_ray.stages.joins import (except_distinct,
                                                 intersect_distinct)

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3, 5, 5, 7], pa.int64())})).repartition(3)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 2, 3, 8], pa.int64())})).repartition(2)
    inter = sorted(intersect_distinct(left, right, on=("k",),
                                      num_partitions=2).to_pandas()["k"])
    exc = sorted(except_distinct(left, right, on=("k",), num_partitions=2,
                                 bloom_bits=1 << 12).to_pandas()["k"])
    assert inter == [2, 3]
    assert exc == [1, 5, 7]


def test_contaminated_doc_ids_modes_agree(ray_session):
    from entity_linking_ray.stages.decontam import contaminated_doc_ids

    test_docs = [
        ("t1", "alpha beta gamma delta epsilon zeta"),
        ("t2", "one two three four five"),
    ]
    train_docs = [
        ("d1", "prefix alpha beta gamma delta suffix"),      # 4-gram hit
        ("d2", "completely unrelated words about pasta sauce"),
        ("d3", "one two three four banana"),                  # hit via t2
        ("d4", "alpha beta delta gamma epsilon"),             # reordered: no 4-gram
        ("d5", ""),
    ]
    mk = lambda rows: ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "text": pa.array([r[1] for r in rows]),
    })).repartition(2)
    for mode in ("broadcast", "join"):
        got = sorted(contaminated_doc_ids(
            mk(train_docs), mk(test_docs), ngram=4, mode=mode,
            num_partitions=2).to_pandas()["doc_id"])
        assert got == ["d1", "d3"], (mode, got)


def test_repetition_stats_values(ray_session):
    from entity_linking_ray.functions.textstats import repetition_stats

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a a a b", "x y z", ""]),
    })
    out = repetition_stats(t).to_pandas().set_index("doc_id")
    assert tuple(out.loc[1]) == (4, 2, 3)
    assert tuple(out.loc[2]) == (3, 3, 1)
    assert tuple(out.loc[3]) == (0, 0, 0)


def test_grouped_ntile_matches_sql(ray_session):
    import duckdb

    from entity_linking_ray.stages.windows import grouped_ntile

    rng = np.random.default_rng(9)
    n = 97
    t = pa.table({
        "u": pa.array(rng.integers(0, 7, n).astype(str)),
        "eid": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.uniform(0, 10, n).round(2)),
    })
    out = grouped_ntile(ray.data.from_arrow(t).repartition(4),
                        key_col="u", id_col="eid", val_col="v",
                        k=4).to_pandas()
    want = duckdb.connect().execute("""
        SELECT eid, ntile(4) OVER (PARTITION BY u
            ORDER BY cast(round(v*100) as bigint), eid) AS tile FROM t
    """).df().set_index("eid")["tile"]
    got = out.set_index("eid")["tile"]
    assert (got.loc[want.index].to_numpy() == want.to_numpy()).all()


def test_rate_thin_and_mix_deterministic(ray_session):
    from entity_linking_ray.stages.sampling import mix_corpora, rate_thin

    ids = np.arange(1000, dtype=np.int64)
    full = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "src": pa.array(["a"] * 1000)}))
    thin = rate_thin(full, id_col="doc_id", keep_num=1, keep_den=4)
    got = sorted(thin.to_pandas()["doc_id"])
    # exact replay of the affine rule
    want = sorted(i for i in ids
                  if ((int(i) * 48271 + 11) % 2147483647) % 4 < 1)
    assert got == want
    assert 150 < len(got) < 350  # ~25%
    # re-running (any partitioning) gives the identical selection
    again = sorted(rate_thin(full.repartition(7), id_col="doc_id",
                             keep_num=1, keep_den=4).to_pandas()["doc_id"])
    assert again == got

    b = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids + 5000), "src": pa.array(["b"] * 1000)}))
    mixed = mix_corpora([(full, 1, 1), (b, 1, 2)], id_col="doc_id")
    df = mixed.to_pandas()
    assert (df["src"] == "a").sum() == 1000          # kept whole
    assert 350 < (df["src"] == "b").sum() < 650      # ~half


def test_grouped_quantile_disc_matches_duckdb_many_q(ray_session):
    """Pin the ceil(q*n)-1 discrete-quantile index to DuckDB
    quantile_disc across uneven group sizes and off-median q."""
    import duckdb

    from entity_linking_ray.stages.windows import grouped_quantile_disc

    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 37, n),          # uneven group sizes
        "v": rng.normal(0, 100, n),
    })
    ds = ray.data.from_pandas(df).repartition(5)
    con = duckdb.connect()
    con.register("t", df)
    for q in (0.1, 0.25, 0.5, 0.9, 1.0):
        got = (grouped_quantile_disc(ds, key_col="k", val_col="v", q=q)
               .to_pandas().sort_values("k").reset_index(drop=True))
        want = con.execute(
            "SELECT k, quantile_disc(cast(round(v * 1000000) as bigint), "
            f"{q}) AS q_units FROM t GROUP BY k ORDER BY k").fetchdf()
        assert (got["k"].values == want["k"].values).all()
        assert (got["q_units"].values == want["q_units"].values).all(), q
    with pytest.raises(ValueError):
        grouped_quantile_disc(ds, key_col="k", val_col="v", q=0.0)


def test_snapshot_diff_statuses(ray_session):
    from entity_linking_ray.stages.diff import snapshot_diff

    old = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([10, 20, 30, 40], pa.int64())}))
    new = ray.data.from_arrow(pa.table({
        "id": pa.array([2, 3, 4, 5], pa.int64()),
        "v": pa.array([20, 31, 40, 50], pa.int64())}))
    out = (snapshot_diff(old, new, key_col="id", val_col="v",
                         num_buckets=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (1, "removed", 10, -1),
        (3, "changed", 30, 31),
        (5, "added", -1, 50),
    ]
    # opt-in unchanged rows; sentinel override
    full = snapshot_diff(old, new, key_col="id", val_col="v",
                         num_buckets=4, include_unchanged=True,
                         missing=0).to_pandas()
    assert len(full) == 5
    assert set(full["status"]) == {"added", "removed", "changed",
                                   "unchanged"}
    assert full.loc[full["id"] == 1, "new_v"].iloc[0] == 0


def test_gap_fill_counts_dense_and_empty(ray_session):
    from entity_linking_ray.stages.windows import gap_fill_counts

    ts = pa.array(np.array([0, 1, 2, 7, 7, 9], dtype="datetime64[s]")
                  .astype("datetime64[us]"))
    ev = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a", "a", "b", "b", "a"]), "ts": ts}))
    out = gap_fill_counts(ev, key_col="k", ts_col="ts",
                          width_us=1_000_000).to_pandas()
    # every key x every second in [0, 9]: 2 * 10 rows, zeros where silent
    assert len(out) == 20
    a = out[out["k"] == "a"].sort_values("bucket")["n"].to_numpy()
    assert (a == [1, 1, 1, 0, 0, 0, 0, 0, 0, 1]).all()
    b = out[out["k"] == "b"].sort_values("bucket")["n"].to_numpy()
    assert (b == [0, 0, 0, 0, 0, 0, 0, 2, 0, 0]).all()

    empty = ray.data.from_arrow(pa.table({
        "k": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us"))}))
    eo = gap_fill_counts(empty, key_col="k", ts_col="ts",
                         width_us=1_000_000)
    assert eo.count() == 0
    assert set(eo.schema().names) == {"k", "bucket", "n"}


def test_pagerank_matches_integer_reference(ray_session):
    """Fixed-point PageRank vs a pure-python reference running the
    identical integer arithmetic — exact equality, any partitioning."""
    from entity_linking_ray.stages.graph import UNITS, pagerank

    raw = [(1, 2), (2, 1), (1, 3), (3, 1), (3, 4), (4, 3), (2, 3),
           (3, 2), (1, 2)]  # duplicate edge must not double-count
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in raw], pa.int64()),
        "dst": pa.array([b for _, b in raw], pa.int64()),
    })).repartition(3)
    got = (pagerank(ds, iters=4, num_buckets=4).to_pandas()
           .sort_values("node").reset_index(drop=True))

    edges = sorted(set(raw))
    nodes = sorted({x for e in edges for x in e})
    deg = {u: sum(1 for s, _ in edges if s == u) for u in nodes}
    n = len(nodes)
    base = (15 * UNITS) // (100 * n)
    r = {u: UNITS // n for u in nodes}
    for _ in range(4):
        inflow = {u: 0 for u in nodes}
        for s, d in edges:
            inflow[d] += (85 * r[s]) // (100 * deg[s])
        r = {u: base + inflow[u] for u in nodes}
    assert got["node"].tolist() == nodes
    assert got["r"].tolist() == [r[u] for u in nodes]
    # node 3 has the highest degree -> highest rank
    assert max(r, key=r.get) == 3


def test_snapshot_diff_strict_rejects_duplicate_keys(ray_session):
    from entity_linking_ray.stages.diff import snapshot_diff

    old = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 1, 2], pa.int64()),
        "v": pa.array([10, 11, 20], pa.int64())}))
    new = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "v": pa.array([10, 21], pa.int64())}))
    with pytest.raises(Exception, match="duplicate key"):
        snapshot_diff(old, new, key_col="id", val_col="v",
                      num_buckets=2).count()
    # strict=False: caller owns dedup; the merge cross-multiplies as
    # documented (both old rows of key 1 pair with its one new row)
    out = snapshot_diff(old, new, key_col="id", val_col="v",
                        num_buckets=2, strict=False,
                        include_unchanged=True).to_pandas()
    assert len(out[out["id"] == 1]) == 2


def test_triangle_count_paths_equivalent(ray_session):
    """Broadcast edge-key probe vs the over-cap co-group fallback: same
    exact count on a graph with known triangles."""
    from entity_linking_ray.stages.graph import triangle_count

    # K4 on {1..4} (4 triangles) + a pendant chain (0) + duplicate edges
    raw = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (0, 1),
           (2, 1), (3, 1)]
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array([a for a, _ in raw], pa.int64()),
        "y": pa.array([b for _, b in raw], pa.int64()),
    })).repartition(3)
    fast = triangle_count(ds, num_buckets=4).to_pandas()
    slow = triangle_count(ds, num_buckets=4,
                          broadcast_edge_cap=0).to_pandas()  # force co-group
    assert int(fast["n_triangles"].iloc[0]) == 4
    assert int(slow["n_triangles"].iloc[0]) == 4


def test_sorted_neighborhood_pairs_exact(ray_session):
    """Every window pair exactly once across bucket boundaries (small
    span forces cross-boundary pairs), vs a brute-force rank window."""
    from entity_linking_ray.stages.blocking import sorted_neighborhood_pairs

    rng = np.random.default_rng(21)
    n, w = 200, 4
    vals = rng.integers(0, 500, n)
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    out = sorted_neighborhood_pairs(
        ray.data.from_arrow(t).repartition(5), val_col="v", id_col="id",
        window=w, num_buckets=16).to_pandas()
    got = sorted(map(tuple, out[["id_a", "id_b", "dist"]].to_numpy()))

    order = sorted(range(n), key=lambda i: (vals[i], i))
    want = []
    for a in range(n):
        for j in range(1, w):
            if a + j < n:
                want.append((order[a], order[a + j], j))
    assert got == sorted(want)
    assert len(got) == len(set((a, b) for a, b, _ in got))  # no dups


def test_compression_ratio_stats(ray_session):
    import pyarrow as pa

    from entity_linking_ray.functions.textstats import compression_ratio_stats

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a" * 4000,                       # boilerplate
                          "the quick brown fox " * 10,      # mild repeat
                          ""]),
    })
    out = compression_ratio_stats(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "ratio_pct"] < 5          # pure repetition
    assert out.loc[1, "raw_len"] == 4000
    assert 5 <= out.loc[2, "ratio_pct"] <= 60
    assert out.loc[3, "ratio_pct"] == 100 and out.loc[3, "raw_len"] == 0
    # deterministic
    again = compression_ratio_stats(t).to_pandas().set_index("doc_id")
    assert (again["compressed_len"] == out["compressed_len"]).all()


def test_pagerank_mass_conservation(ray_session):
    """Total rank mass stays within floor-division dust of UNITS."""
    from entity_linking_ray.stages.graph import UNITS, pagerank

    raw = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in raw], pa.int64()),
        "dst": pa.array([b for _, b in raw], pa.int64())}))
    out = pagerank(ds, iters=5, num_buckets=2).to_pandas()
    total = int(out["r"].sum())
    n = len(out)
    # each iteration loses < 1 unit per node per edge division + base
    assert total <= UNITS
    assert total >= UNITS - 5 * n * 200  # generous dust bound
    assert (out["r"] > 0).all()
