"""Sliding and session window aggregates."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from entity_linking_ray.stages.windows import session_windows, sliding_window_agg

_US_MIN = 60_000_000


def _events(rows):
    return ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * _US_MIN for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    }))


def test_sliding_window_counts(ray_session):
    # events at minute 0, 10, 70; windows width 60 min, slide 15 min
    ev = _events([(1, 0, 1.0), (1, 10, 2.5), (1, 70, 4.0)])
    out = sliding_window_agg(ev, width_us=60 * _US_MIN,
                             slide_us=15 * _US_MIN).to_pandas()
    got = {int(r.window_start) // _US_MIN: (int(r.n_events), int(r.sum_cents))
           for r in out.itertuples()}
    # brute force: event t is in windows [t-45, t] stepped by 15 (aligned)
    expect = {}
    for t, cents in ((0, 100), (10, 250), (70, 400)):
        base = (t // 15) * 15
        for i in range(4):
            w = base - 15 * i
            n, s = expect.get(w, (0, 0))
            expect[w] = (n + 1, s + cents)
    assert got == expect
    # an event in multiple overlapping windows: minute 10 covers -45..10
    assert got[0] == (2, 350)  # window [0,60): events at 0 and 10


def test_session_windows_gap_split(ray_session):
    # user 1: events at minutes 0, 10, 100 (gap 90 > 30 → split);
    # user 2: single event; ties at the same timestamp stay together
    ev = _events([(1, 0, 0.0), (1, 10, 0.0), (1, 100, 0.0),
                  (2, 5, 0.0), (1, 10, 0.0)])
    out = session_windows(ev, gap_us=30 * _US_MIN).to_pandas()
    rows = sorted(
        (int(r.user_id), int(r.session_start) // _US_MIN,
         int(r.n_events), int(r.duration_us) // _US_MIN)
        for r in out.itertuples())
    assert rows == [
        (1, 0, 3, 10),    # minutes 0, 10, 10 — one session, 10 min long
        (1, 100, 1, 0),   # split by the 90-minute gap
        (2, 5, 1, 0),
    ]


def test_window_ops_typed_empty_for_empty_input(ray_session):
    """Regression (round-5 ADVICE): session_windows / grouped_lag_delta /
    grouped_rolling_window on EMPTY input keep a typed schema (the pinned
    'typed empty out for empty in' contract) so later unions with a typed
    side and schema() consumers don't break."""
    from entity_linking_ray.stages.windows import (grouped_lag_delta,
                                                   grouped_rolling_window)

    empty = ray.data.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
    }))

    s = session_windows(empty, gap_us=30 * _US_MIN)
    assert s.count() == 0
    assert [f.name for f in s.schema().base_schema] == \
        ["user_id", "session_start", "n_events", "duration_us"]
    assert str(s.schema().base_schema.field("user_id").type) == "int64"

    lag = grouped_lag_delta(empty, key_col="user_id", ts_col="ts",
                            id_col="event_id", val_col="value")
    assert lag.count() == 0
    assert set(f.name for f in lag.schema().base_schema) == {
        "user_id", "event_id", "t", "value_units", "prev_units",
        "delta_units"}

    roll = grouped_rolling_window(empty, key_col="user_id", ts_col="ts",
                                  id_col="event_id", val_col="value",
                                  window_rows=3)
    assert roll.count() == 0
    assert set(f.name for f in roll.schema().base_schema) == {
        "user_id", "event_id", "t", "value_units", "win_units", "win_n"}

    # non-empty output is unchanged by the appended typed-empty block
    ev = _events([(1, 0, 1.0), (1, 10, 2.0)])
    out = session_windows(ev, gap_us=30 * _US_MIN).to_pandas()
    assert len(out) == 1 and int(out["n_events"].iloc[0]) == 2


def test_grouped_ohlc_multi_key_vs_pandas(ray_session):
    """grouped_ohlc across uneven partitions equals a pandas groupby
    reference on (key1, key2), including (ts, id) tie-breaks."""
    import pandas as pd

    from entity_linking_ray.stages.windows import grouped_ohlc

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
        "w": rng.integers(0, 4, n).astype(np.int64),
        # few distinct timestamps → real (ts, id) ties inside keys
        "ts": rng.integers(0, 6, n).astype("int64"),
        "cents": rng.integers(-500, 500, n).astype(np.int64),
    })
    tbl = pa.table({
        "event_id": pa.array(df["event_id"]),
        "event_type": pa.array(df["event_type"]),
        "w": pa.array(df["w"]),
        "ts": pa.array(df["ts"].to_numpy(), pa.timestamp("us")),
        "cents": pa.array(df["cents"]),
    })
    out = grouped_ohlc(ray.data.from_arrow(tbl).repartition(7),
                       key_cols=["event_type", "w"], ts_col="ts",
                       id_col="event_id", val_col="cents"
                       ).to_pandas().sort_values(["event_type", "w"])

    sdf = df.sort_values(["ts", "event_id"], kind="mergesort")
    ref = sdf.groupby(["event_type", "w"]).agg(
        open=("cents", "first"), high=("cents", "max"),
        low=("cents", "min"), close=("cents", "last"),
        n_events=("cents", "size")).reset_index() \
        .sort_values(["event_type", "w"])
    for c in ("open", "high", "low", "close", "n_events"):
        assert (out[c].to_numpy(np.int64) ==
                ref[c].to_numpy(np.int64)).all(), c


def test_grouped_ohlc_typed_empty(ray_session):
    from entity_linking_ray.stages.windows import grouped_ohlc

    empty = ray.data.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "w": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "cents": pa.array([], pa.int64()),
    }))
    out = grouped_ohlc(empty, key_cols=["event_type", "w"], ts_col="ts",
                       id_col="event_id", val_col="cents")
    assert out.count() == 0
    assert set(f.name for f in out.schema().base_schema) == {
        "event_type", "w", "open", "high", "low", "close", "n_events"}
    assert str(out.schema().base_schema.field("open").type) == "int64"
