"""Property tests: windowed/temporal operators vs brute-force references.

Random event sets (hypothesis) → the distributed operators must agree
exactly with O(n²)/O(n log n) driver-side reference implementations."""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray
import ray.data

from entity_linking_ray.stages.joins import asof_join_latest, range_join_count
from entity_linking_ray.stages.windows import session_windows, sliding_window_agg

_EVENTS = st.lists(
    st.tuples(st.integers(0, 3),            # user/key
              st.integers(0, 500),          # ts (us — small ints exercise ties)
              st.integers(0, 2)),           # side selector / value
    min_size=1, max_size=40)

_SETTINGS = settings(max_examples=15, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow])


def _ds(rows, with_value=False):
    cols = {
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }
    if with_value:
        cols["value"] = pa.array([float(r[2]) for r in rows], pa.float64())
    return ray.data.from_arrow(pa.table(cols))


@given(_EVENTS)
@_SETTINGS
def test_sliding_window_matches_bruteforce(rows):
    width, slide = 100, 25
    out = sliding_window_agg(_ds(rows, with_value=True),
                             width_us=width, slide_us=slide).to_pandas()
    got = {int(r.window_start): (int(r.n_events), int(r.sum_cents))
           for r in out.itertuples()}
    expect: dict[int, list[int]] = {}
    for _, t, v in rows:
        for w in range((t // slide) * slide - width + slide,
                       (t // slide) * slide + 1, slide):
            e = expect.setdefault(w, [0, 0])
            e[0] += 1
            e[1] += round(v * 100)
    assert got == {w: (n, s) for w, (n, s) in expect.items()}


@given(_EVENTS)
@_SETTINGS
def test_session_windows_match_bruteforce(rows):
    gap = 50
    out = session_windows(_ds(rows), gap_us=gap).to_pandas()
    got = sorted((int(r.user_id), int(r.session_start), int(r.n_events),
                  int(r.duration_us)) for r in out.itertuples())
    expect = []
    by_user: dict[int, list[int]] = {}
    for u, t, _ in rows:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        start = prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > gap:
                expect.append((u, start, n, prev - start))
                start, n = t, 0
            n += 1
            prev = t
        expect.append((u, start, n, prev - start))
    assert got == sorted(expect)


@given(_EVENTS)
@_SETTINGS
def test_asof_and_range_match_bruteforce(rows):
    left_rows = [r for r in rows if r[2] == 0] or rows[:1]
    right_rows = [r for r in rows if r[2] != 0]
    left, right = _ds(left_rows), _ds(right_rows)
    rt_by_user: dict[int, list[int]] = {}
    for u, t, _ in right_rows:
        rt_by_user.setdefault(u, []).append(t)
    for v in rt_by_user.values():
        v.sort()

    asof = asof_join_latest(left, right, key="user_id", ts="ts",
                            left_id="event_id").to_pandas()
    got = {(int(r.user_id), int(r.t), int(r.event_id)): int(r.asof_t)
           for r in asof.itertuples()}
    for i, (u, t, _) in enumerate(left_rows):
        prior = [x for x in rt_by_user.get(u, []) if x <= t]
        assert got[(u, t, i)] == (max(prior) if prior else -1)

    before = after = 30
    rng = range_join_count(left, right, key="user_id", ts="ts",
                           left_id="event_id", before_us=before,
                           after_us=after).to_pandas()
    got_n = {(int(r.user_id), int(r.t), int(r.event_id)): int(r.n_in_range)
             for r in rng.itertuples()}
    for i, (u, t, _) in enumerate(left_rows):
        n = sum(1 for x in rt_by_user.get(u, []) if t - before <= x <= t + after)
        assert got_n[(u, t, i)] == n


@given(_EVENTS)
@_SETTINGS
def test_salted_temporal_ops_equal_unsalted(rows):
    """The hot-key salted plans (salt_bucket_us) must equal the unsalted
    co-group plans exactly — boundaries, ties and empty sides included.
    W=64 over ts∈[0,500] forces multi-bucket keys and cross-bucket
    fallbacks/merges."""
    W = 64
    left_rows = [r for r in rows if r[2] == 0] or rows[:1]
    right_rows = [r for r in rows if r[2] != 0]
    left, right = _ds(left_rows), _ds(right_rows)

    a0 = asof_join_latest(left, right, key="user_id", ts="ts",
                          left_id="event_id").to_pandas()
    a1 = asof_join_latest(left, right, key="user_id", ts="ts",
                          left_id="event_id", salt_bucket_us=W,
                          hot_key_rows=1).to_pandas()
    key = lambda df: sorted(map(tuple, df[["event_id", "user_id", "t",
                                           "asof_t"]].to_numpy()))
    assert key(a0) == key(a1)

    r0 = range_join_count(left, right, key="user_id", ts="ts",
                          left_id="event_id", before_us=30,
                          after_us=30).to_pandas()
    r1 = range_join_count(left, right, key="user_id", ts="ts",
                          left_id="event_id", before_us=30, after_us=30,
                          salt_bucket_us=W, hot_key_rows=1).to_pandas()
    rkey = lambda df: sorted(map(tuple, df[["event_id", "user_id", "t",
                                            "n_in_range"]].to_numpy()))
    assert rkey(r0) == rkey(r1)

    s0 = session_windows(_ds(rows), gap_us=50).to_pandas()
    s1 = session_windows(_ds(rows), gap_us=50, salt_bucket_us=W,
                         hot_key_rows=1).to_pandas()
    skey = lambda df: sorted(map(tuple, df[["user_id", "session_start",
                                            "n_events", "duration_us"]].to_numpy()))
    assert skey(s0) == skey(s1)


def test_salted_temporal_ops_on_hot_key(ray_session):
    """Deterministic skewed fixture: one hot user owns 95% of the events
    across many salt buckets (including a session that spans buckets and
    as-of probes whose predecessor sits buckets away); salted == unsalted."""
    rng = np.random.default_rng(42)
    rows = []
    t = 0
    for i in range(400):           # hot user 0: dense stream, gaps mixed
        t += int(rng.integers(1, 120))
        rows.append((0, t, int(i % 3 == 0)))
    rows += [(u, int(rng.integers(0, t)), u % 2) for u in range(1, 8)]
    W = 256                         # many buckets over the hot stream

    left_rows = [r for r in rows if r[2] == 0] or rows[:1]
    right_rows = [r for r in rows if r[2] != 0]
    left, right = _ds(left_rows), _ds(right_rows)

    a0 = asof_join_latest(left, right, key="user_id", ts="ts",
                          left_id="event_id").to_pandas()
    a1 = asof_join_latest(left, right, key="user_id", ts="ts",
                          left_id="event_id", salt_bucket_us=W,
                          hot_key_rows=50).to_pandas()
    cols = ["event_id", "user_id", "t", "asof_t"]
    assert sorted(map(tuple, a0[cols].to_numpy())) == \
        sorted(map(tuple, a1[cols].to_numpy()))

    r0 = range_join_count(left, right, key="user_id", ts="ts",
                          left_id="event_id", before_us=200,
                          after_us=100).to_pandas()
    r1 = range_join_count(left, right, key="user_id", ts="ts",
                          left_id="event_id", before_us=200, after_us=100,
                          salt_bucket_us=W, hot_key_rows=50).to_pandas()
    cols = ["event_id", "user_id", "t", "n_in_range"]
    assert sorted(map(tuple, r0[cols].to_numpy())) == \
        sorted(map(tuple, r1[cols].to_numpy()))

    s0 = session_windows(_ds(rows), gap_us=100).to_pandas()
    s1 = session_windows(_ds(rows), gap_us=100, salt_bucket_us=W,
                         hot_key_rows=50).to_pandas()
    cols = ["user_id", "session_start", "n_events", "duration_us"]
    assert sorted(map(tuple, s0[cols].to_numpy())) == \
        sorted(map(tuple, s1[cols].to_numpy()))
    # the hot key genuinely spans buckets: >1 bucket and >1 merged session
    assert t // W > 3 and (s1["user_id"] == 0).sum() >= 1


def test_hot_key_detection_and_cold_routing(ray_session):
    """hot_keys finds exactly the keys at/above the threshold via the
    combiner count; with no hot keys the routed plans reduce to the plain
    co-group (same output, no salted phases)."""
    from entity_linking_ray.stages.joins import hot_keys

    rows = [(0, t, 0) for t in range(40)] + [(u, 5, 1) for u in range(1, 5)]
    ds = _ds(rows)
    assert hot_keys(ds, "user_id", 40) == [0]
    assert hot_keys(ds, "user_id", 41) == []
    assert sorted(hot_keys(ds, "user_id", 1)) == [0, 1, 2, 3, 4]


def test_running_sum_salted_equals_plain(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from entity_linking_ray.stages.windows import grouped_running_sum

    rng = np.random.default_rng(23)
    # one hot user with most of the stream + a few cold ones
    n_hot, n_cold = 3000, 300
    user = np.concatenate([np.zeros(n_hot, np.int64),
                           rng.integers(1, 9, n_cold)])
    n = len(user)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(user),
        "ts": pa.array(rng.integers(0, 10**7, n), pa.timestamp("us")),
        "value": pa.array(rng.normal(5, 2, n), pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(6)
    kw = dict(key_col="user_id", ts_col="ts", id_col="event_id",
              val_col="value")
    plain = grouped_running_sum(ds, **kw).to_pandas()
    salted = grouped_running_sum(ds, **kw, salt_bucket_us=500_000,
                                 hot_key_rows=1000).to_pandas()
    cols = ["user_id", "event_id", "t", "value_units", "run_units", "run_n"]
    a = plain[cols].sort_values(["user_id", "t", "event_id"]).reset_index(drop=True)
    b = salted[cols].sort_values(["user_id", "t", "event_id"]).reset_index(drop=True)
    assert a.equals(b)


def test_rolling_window_salted_equals_plain(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from entity_linking_ray.stages.windows import grouped_rolling_window

    rng = np.random.default_rng(29)
    n_hot, n_cold = 2500, 200
    user = np.concatenate([np.zeros(n_hot, np.int64),
                           rng.integers(1, 7, n_cold)])
    n = len(user)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(user),
        "ts": pa.array(rng.integers(0, 10**7, n), pa.timestamp("us")),
        "value": pa.array(rng.normal(5, 2, n), pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(5)
    kw = dict(key_col="user_id", ts_col="ts", id_col="event_id",
              val_col="value", window_rows=5)
    plain = grouped_rolling_window(ds, **kw).to_pandas()
    # tiny salt bucket: many buckets hold FEWER than window_rows-1 rows,
    # forcing the multi-bucket lookback in the patch pass
    salted = grouped_rolling_window(ds, **kw, salt_bucket_us=2_000,
                                    hot_key_rows=1000).to_pandas()
    cols = ["user_id", "event_id", "t", "value_units", "win_units", "win_n"]
    a = plain[cols].sort_values(["user_id", "t", "event_id"]).reset_index(drop=True)
    b = salted[cols].sort_values(["user_id", "t", "event_id"]).reset_index(drop=True)
    assert a.equals(b)
