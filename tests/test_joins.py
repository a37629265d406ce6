"""As-of and range temporal joins (stages/joins.py)."""

import pyarrow as pa

import ray
import ray.data

from entity_linking_ray.stages.joins import asof_join_latest, range_join_count

_M = 60_000_000  # one minute in us


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] * _M for r in rows], pa.timestamp("us")),
    }))


def test_asof_latest_prior(ray_session):
    left = _ds([(100, 1, 10), (101, 1, 3), (102, 2, 5), (103, 3, 1)])
    right = _ds([(200, 1, 4), (201, 1, 9), (202, 1, 9),  # tie at t=9
                 (203, 2, 5)])                            # boundary: equal ts
    out = asof_join_latest(left, right, key="user_id", ts="ts",
                           left_id="event_id").to_pandas()
    got = {int(r.event_id): int(r.asof_t) // _M for r in out.itertuples()}
    assert got == {
        100: 9,    # latest prior click (tie at 9 → same timestamp either way)
        101: -1,   # no click at or before minute 3... wait, 4 > 3 → none
        102: 5,    # equal timestamp counts (ts >= ts)
        103: -1,   # user 3 has no clicks at all
    }


def test_range_count_window_edges(ray_session):
    left = _ds([(100, 1, 10), (101, 2, 10)])
    right = _ds([(200, 1, 5), (201, 1, 15), (202, 1, 16),  # 16 > 10+5
                 (203, 1, 4)])                             # 4 < 10-5
    out = range_join_count(left, right, key="user_id", ts="ts",
                           left_id="event_id",
                           before_us=5 * _M, after_us=5 * _M).to_pandas()
    got = {int(r.event_id): int(r.n_in_range) for r in out.itertuples()}
    # inclusive window [5, 15]: rows at 5 and 15 count, 4 and 16 do not
    assert got == {100: 2, 101: 0}


def test_asof_join_value_vs_brute(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from entity_linking_ray.stages.joins import asof_join_value

    rng = np.random.default_rng(17)
    nl, nr = 120, 200
    left = pa.table({
        "lid": pa.array(np.arange(nl), pa.int64()),
        "k": pa.array(rng.integers(0, 6, nl), pa.int64()),
        "ts": pa.array(rng.integers(0, 1000, nl), pa.timestamp("us")),
    })
    # duplicate right timestamps per key to exercise the (t, rid) tie-break
    rts = rng.integers(0, 1000, nr) // 10 * 10
    right = pa.table({
        "rid": pa.array(np.arange(nr), pa.int64()),
        "k": pa.array(rng.integers(0, 6, nr), pa.int64()),
        "ts": pa.array(rts, pa.timestamp("us")),
        "v": pa.array(rng.integers(-50, 50, nr), pa.int64()),
    })
    out = asof_join_value(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(3),
        key="k", ts="ts", left_id="lid", right_id="rid",
        right_val="v").to_pandas().set_index("lid").sort_index()

    lf, rf = left.to_pandas(), right.to_pandas()
    lf["t"] = lf["ts"].astype("int64")
    rf["t"] = rf["ts"].astype("int64")
    want = []
    for r in lf.itertuples():
        c = rf[(rf["k"] == r.k) & (rf["t"] <= r.t)]
        want.append(int(c.sort_values(["t", "rid"]).iloc[-1]["v"])
                    if len(c) else -1)
    assert out["asof_val"].tolist() == want


def test_range_join_sum_vs_brute(ray_session):
    import numpy as np
    import pyarrow as pa

    from entity_linking_ray.stages.joins import range_join_sum

    rng = np.random.default_rng(19)
    nl, nr = 100, 180
    left = pa.table({
        "lid": pa.array(np.arange(nl), pa.int64()),
        "k": pa.array(rng.integers(0, 5, nl), pa.int64()),
        "ts": pa.array(rng.integers(0, 1000, nl), pa.timestamp("us")),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, 5, nr), pa.int64()),
        "ts": pa.array(rng.integers(0, 1000, nr), pa.timestamp("us")),
        "v": pa.array(rng.integers(-30, 30, nr), pa.int64()),
    })
    out = range_join_sum(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(3),
        key="k", ts="ts", left_id="lid", right_val="v",
        before_us=50, after_us=20).to_pandas().set_index("lid").sort_index()
    lf, rf = left.to_pandas(), right.to_pandas()
    lf["t"] = lf["ts"].astype("int64")
    rf["t"] = rf["ts"].astype("int64")
    for r in lf.itertuples():
        c = rf[(rf["k"] == r.k) & (rf["t"] >= r.t - 50) & (rf["t"] <= r.t + 20)]
        assert out.loc[r.lid, "sum_in_range"] == c["v"].sum()
        assert out.loc[r.lid, "n_in_range"] == len(c)


def test_interpolate_asof_edge_rules(ray_session):
    """Exact match -> that value; before-first -> backfill; after-last ->
    hold-last; empty key -> sentinel; interior -> exact integer interp."""
    import pyarrow as pa

    from entity_linking_ray.stages.joins import interpolate_asof

    def mk(rows, idc):
        return ray.data.from_arrow(pa.table({
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            idc: pa.array([r[2] for r in rows], pa.int64()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
        }))

    clicks = mk([(1, 1000, 100, 2.0), (1, 2000, 101, 4.0)], "cid")
    probes = mk([(1, 1500, 1, 0), (1, 1000, 2, 0), (1, 500, 3, 0),
                 (1, 3000, 4, 0), (2, 1200, 5, 0)], "eid")
    out = (interpolate_asof(probes, clicks, key="u", ts="ts",
                            left_id="eid", right_id="cid",
                            right_val="value")
           .to_pandas().set_index("eid")["v_interp"])
    assert out.loc[1] == 300   # midpoint of 200/400 cents
    assert out.loc[2] == 200   # exact match
    assert out.loc[3] == 200   # before first -> backfill
    assert out.loc[4] == 400   # after last -> hold-last
    assert out.loc[5] == -1    # key with no values -> sentinel


def test_interpolate_asof_matches_bruteforce_random(ray_session):
    import numpy as np
    import pyarrow as pa

    from entity_linking_ray.stages.joins import interpolate_asof

    rng = np.random.default_rng(31)
    n_val, n_probe = 300, 200
    def mk(n, idc, with_val):
        return ray.data.from_arrow(pa.table({
            "u": pa.array(rng.integers(0, 12, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 10_000, n)
                           .astype("datetime64[us]")),
            idc: pa.array(np.arange(n), pa.int64()),
            "value": pa.array(rng.uniform(0, 100, n).round(2)
                              if with_val else np.zeros(n)),
        })).repartition(5)

    vals_t = mk(n_val, "vid", True).to_pandas()
    probes_t = mk(n_probe, "pid", False).to_pandas()
    vals = ray.data.from_pandas(vals_t).repartition(4)
    probes = ray.data.from_pandas(probes_t).repartition(3)
    got = (interpolate_asof(probes, vals, key="u", ts="ts",
                            left_id="pid", right_id="vid",
                            right_val="value")
           .to_pandas().set_index("pid")["v_interp"])

    cents = (vals_t["value"] * 100).round().astype(np.int64)

    def us(x):  # one unit everywhere (Timestamp.value is ns, not us)
        return int(np.datetime64(x).astype("datetime64[us]")
                   .astype(np.int64))

    for _, p in probes_t.iterrows():
        sub = vals_t[vals_t["u"] == p["u"]]
        t = us(p["ts"])
        tus = sub["ts"].map(us)
        before = sub[tus <= t]
        after = sub[tus > t]
        if len(before):
            b = before.sort_values(["ts", "vid"]).iloc[-1]
            t0, v0 = us(b["ts"]), int(cents.loc[b.name])
        if len(after):
            a = after.sort_values(["ts", "vid"]).iloc[0]
            t1, v1 = us(a["ts"]), int(cents.loc[a.name])
        if len(before) and len(after):
            want = (v0 * (t1 - t) + v1 * (t - t0)) // (t1 - t0)
        elif len(before):
            want = v0
        elif len(after):
            want = v1
        else:
            want = -1
        assert got.loc[p["pid"]] == want, p["pid"]


def test_interval_overlap_pairs_vs_bruteforce(ray_session):
    """Sweep-run pair generation ≡ the O(n²) definition, including
    inverted intervals (end < start) and closed-end touching pairs."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from entity_linking_ray.stages.joins import interval_overlap_pairs

    rng = np.random.default_rng(5)
    n = 300
    key = rng.integers(0, 12, n).astype(np.int64)
    s = rng.integers(0, 100, n).astype(np.int64)
    e = s + rng.integers(-20, 30, n)  # ~40% inverted
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"k": key, "id": ids, "s": s, "e": e})
    out = interval_overlap_pairs(
        ray.data.from_arrow(t).repartition(5), key_col="k", id_col="id",
        start_col="s", end_col="e").to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            if key[i] == key[j] and s[i] <= e[j] and s[j] <= e[i]:
                want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert got == want
    ov = dict(zip(zip(out["id_a"], out["id_b"]), out["overlap_us"]))
    for (a, b), v in ov.items():
        assert v == min(e[a], e[b]) - max(s[a], s[b])


def test_interval_overlap_pairs_typed_empty_and_cap(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from entity_linking_ray.stages.joins import interval_overlap_pairs

    empty = ray.data.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "id": pa.array([], pa.int64()),
        "s": pa.array([], pa.int64()), "e": pa.array([], pa.int64())}))
    out = interval_overlap_pairs(empty, key_col="k", id_col="id",
                                 start_col="s", end_col="e")
    assert out.count() == 0
    assert set(f.name for f in out.schema().base_schema) == {
        "k", "id_a", "id_b", "overlap_us"}

    hot = pa.table({"k": pa.array([1] * 50, pa.int64()),
                    "id": pa.array(range(50), pa.int64()),
                    "s": pa.array([0] * 50, pa.int64()),
                    "e": pa.array([10] * 50, pa.int64())})
    with pytest.raises(Exception, match="max_pairs_per_key"):
        interval_overlap_pairs(ray.data.from_arrow(hot), key_col="k",
                               id_col="id", start_col="s", end_col="e",
                               max_pairs_per_key=100).materialize()
