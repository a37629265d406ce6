"""Rank-family operators: exact grouped quantiles + grouped top-N, each
checked against an independent DuckDB formulation on seeded random data
(the same shape the driver's sf0.01 oracle uses)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from entity_linking_ray.stages.rank import grouped_quantiles, topn_per_group


@pytest.fixture(scope="module")
def skewed_values():
    rng = np.random.default_rng(7)
    n = 5000
    # heavy duplicate mass (quantile_disc over a multiset) + one hot key
    key = np.where(rng.random(n) < 0.5, "hot",
                   rng.choice(["a", "b", "c"], size=n))
    val = np.round(rng.gamma(2.0, 50.0, size=n), 3)
    val[rng.random(n) < 0.2] = 9.995  # exact .5-cent ties both sides round
    return pd.DataFrame({"k": key, "v": val,
                         "id": np.arange(n, dtype=np.int64)})


def test_grouped_quantiles_match_duckdb(ray_session, skewed_values):
    ds = ray.data.from_pandas(skewed_values).repartition(7)
    got = (grouped_quantiles(ds, key_col="k", val_col="v",
                             qs_pct=(50, 95, 99))
           .to_pandas().sort_values("k").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", skewed_values)
    want = con.execute("""
        SELECT k, cast(count(*) as bigint) AS n,
               cast(quantile_disc(cast(round(v*100) as bigint), 0.50) as bigint) AS p50_units,
               cast(quantile_disc(cast(round(v*100) as bigint), 0.95) as bigint) AS p95_units,
               cast(quantile_disc(cast(round(v*100) as bigint), 0.99) as bigint) AS p99_units
        FROM t GROUP BY k ORDER BY k
    """).df()
    pd.testing.assert_frame_equal(
        got[["k", "n", "p50_units", "p95_units", "p99_units"]],
        want, check_dtype=False)


def test_grouped_quantiles_single_row_groups(ray_session):
    df = pd.DataFrame({"k": ["x", "y"], "v": [1.234, -5.678]})
    got = (grouped_quantiles(ray.data.from_pandas(df), key_col="k",
                             val_col="v", qs_pct=(50, 99))
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["n"].tolist() == [1, 1]
    assert got["p50_units"].tolist() == [123, -568]
    assert got["p99_units"].tolist() == [123, -568]


def test_topn_per_group_matches_row_number(ray_session, skewed_values):
    ds = ray.data.from_pandas(skewed_values).repartition(7)
    got = (topn_per_group(ds, key_col="k", order_col="v", id_col="id", n=4)
           .to_pandas().sort_values(["k", "rn"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", skewed_values)
    want = con.execute("""
        SELECT k, rn, id, v FROM (
          SELECT k, id, v,
                 cast(row_number() OVER (PARTITION BY k
                      ORDER BY v DESC, id ASC) as bigint) AS rn
          FROM t) WHERE rn <= 4 ORDER BY k, rn
    """).df()
    pd.testing.assert_frame_equal(got[["k", "rn", "id", "v"]], want,
                                  check_dtype=False)


def test_topn_combiner_bounds_shuffle(skewed_values):
    """The per-block combiner must emit <= n rows per key per block —
    the property that bounds shuffle volume under a hot key."""
    from entity_linking_ray.stages.rank import block_topn

    batch = skewed_values.iloc[:1000]
    kept = block_topn(batch, "k", "v", "id", 4)
    assert kept.groupby("k").size().max() <= 4
    assert len(kept) < len(batch)


def test_skyline_2d_dominance_semantics(ray_session):
    """Identical points both survive; weak dominance with one strict
    improvement removes; matches the brute-force NOT EXISTS filter on a
    random fixture regardless of partitioning."""
    import pyarrow as pa

    from entity_linking_ray.stages.rank import skyline_2d

    pts = [(1, 5, 5), (2, 5, 5),      # duplicates: both kept
           (3, 5, 6),                 # dominated by (5,5)
           (4, 4, 7), (5, 3, 9), (6, 9, 1), (7, 9, 2)]
    t = pa.table({"id": pa.array([p[0] for p in pts], pa.int64()),
                  "x": pa.array([p[1] for p in pts], pa.int64()),
                  "y": pa.array([p[2] for p in pts], pa.int64())})
    out = skyline_2d(ray.data.from_arrow(t).repartition(3),
                     id_col="id", x_col="x", y_col="y").to_pandas()
    assert sorted(out["id"]) == [1, 2, 4, 5, 6]

    rng = np.random.default_rng(13)
    xs = rng.integers(0, 60, 400)
    ys = rng.integers(0, 60, 400)
    t2 = pa.table({"id": pa.array(np.arange(400), pa.int64()),
                   "x": pa.array(xs, pa.int64()),
                   "y": pa.array(ys, pa.int64())})
    got = sorted(skyline_2d(ray.data.from_arrow(t2).repartition(7),
                            id_col="id", x_col="x", y_col="y")
                 .to_pandas()["id"])
    want = [i for i in range(400)
            if not any((xs[j] <= xs[i] and ys[j] <= ys[i]
                        and (xs[j] < xs[i] or ys[j] < ys[i]))
                       for j in range(400))]
    assert got == want


def test_grouped_quantiles_cont_matches_duckdb(ray_session):
    """quantile_cont parity on uneven group sizes and tied values —
    quarter-fraction ranks keep every float64 intermediate exact."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from entity_linking_ray.stages.rank import grouped_quantiles_cont

    rng = np.random.default_rng(11)
    n = 501
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b", "c"], n)),
        "v": pa.array(rng.integers(-300, 300, n).astype(np.float64) / 100),
    })
    got = (grouped_quantiles_cont(
        ray.data.from_arrow(t).repartition(4), key_col="k", val_col="v",
        qs_pct=(25, 50, 75)).to_pandas().sort_values("k")
        .reset_index(drop=True))
    want = duckdb.sql("""
        WITH e AS (SELECT k, cast(round(v*100) as bigint) AS c FROM t)
        SELECT k, count(*) AS n, quantile_cont(c, 0.25) AS p25_cont,
               quantile_cont(c, 0.5) AS p50_cont,
               quantile_cont(c, 0.75) AS p75_cont
        FROM e GROUP BY k ORDER BY k""").df()
    for c in ("n", "p25_cont", "p50_cont", "p75_cont"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_grouped_quantiles_cont_refuses_inexact_percentiles(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from entity_linking_ray.stages.rank import grouped_quantiles_cont

    t = pa.table({"k": ["a"], "v": [1.0]})
    with pytest.raises(ValueError, match="quarter"):
        grouped_quantiles_cont(ray.data.from_arrow(t), key_col="k",
                               val_col="v", qs_pct=(95,))
