"""grouped_lag_delta vs DuckDB lag() window on seeded random events."""

import duckdb
import numpy as np
import pandas as pd

import ray.data

from entity_linking_ray.stages.windows import grouped_lag_delta


def test_grouped_lag_delta_matches_window(ray_session):
    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, n, dtype=np.int64),
        # duplicate timestamps on purpose: tie-break by event_id matters
        "ts": pd.to_datetime(rng.integers(0, 500, n), unit="s"),
        "value": np.round(rng.normal(50, 20, n), 3),
    })
    # a user with a single event exercises the empty-lag branch
    df.loc[0, "user_id"] = 999

    got = (grouped_lag_delta(ray.data.from_pandas(df).repartition(7),
                             key_col="user_id", ts_col="ts",
                             id_col="event_id", val_col="value")
           .to_pandas().sort_values(["user_id", "t", "event_id"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
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
        ORDER BY user_id, t, event_id
    """).df()
    cols = ["user_id", "event_id", "t", "value_units", "prev_units",
            "delta_units"]
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=False)
    assert (got["user_id"] != 999).all()


def test_grouped_lag_salted_equals_plain_on_skew(ray_session):
    """One hot user with most of the stream (incl. duplicate timestamps
    spanning bucket boundaries) must produce identical lag output through
    the salted per-(key, time-bucket) plan and the plain per-key plan."""
    rng = np.random.default_rng(23)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.where(rng.random(n) < 0.8, 7,
                            rng.integers(0, 12, n)).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 2000, n), unit="s"),
        "value": np.round(rng.normal(10, 5, n), 3),
    })
    kw = dict(key_col="user_id", ts_col="ts", id_col="event_id",
              val_col="value")
    ds = ray.data.from_pandas(df).repartition(5)
    plain = grouped_lag_delta(ds, **kw).to_pandas()
    # hot_key_rows=1000 → user 7 is hot; 300s buckets split its history
    salted = grouped_lag_delta(ds, salt_bucket_us=300_000_000,
                               hot_key_rows=1000, **kw).to_pandas()
    key = lambda d: d.sort_values(["user_id", "t", "event_id"]) \
                     .reset_index(drop=True)
    cols = ["user_id", "event_id", "t", "value_units", "prev_units",
            "delta_units"]
    pd.testing.assert_frame_equal(key(plain)[cols], key(salted)[cols],
                                  check_dtype=False)
