"""bucketed_agg (stages/agg.py): exact parity with a pandas groupby
reference across key types, aggregate kinds, and the distinct form."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from entity_linking_ray.stages.agg import bucketed_agg


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(0)
    n = 50_000
    return pa.table({
        "k": pa.array(rng.integers(0, 5000, n)),
        "s": pa.array([f"g{x}" for x in rng.integers(0, 7, n)]),
        "v": pa.array(rng.integers(-100, 100, n)),
    })


def test_bucketed_agg_matches_pandas(ray_session, frame):
    ds = ray.data.from_arrow(frame).repartition(6)
    df = frame.to_pandas()
    got = bucketed_agg(ds, ["k", "s"],
                       [("v", "sum", "v_sum"), ("v", "min", "v_min"),
                        ("v", "max", "v_max"), ("v", "count", "n")]) \
        .to_pandas().sort_values(["k", "s"]).reset_index(drop=True)
    want = (df.groupby(["k", "s"])
            .agg(v_sum=("v", "sum"), v_min=("v", "min"),
                 v_max=("v", "max"), n=("v", "size"))
            .reset_index().sort_values(["k", "s"]).reset_index(drop=True))
    for c in ["v_sum", "v_min", "v_max", "n"]:
        assert (got[c].to_numpy(np.int64)
                == want[c].to_numpy(np.int64)).all(), c
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert list(got["s"]) == list(want["s"])


def test_bucketed_agg_distinct_and_string_key(ray_session, frame):
    ds = ray.data.from_arrow(frame).repartition(6)
    df = frame.to_pandas()
    got = bucketed_agg(ds, ["s", "k"]).to_pandas()
    want = df[["s", "k"]].drop_duplicates()
    assert (sorted(map(tuple, got[["s", "k"]].values.tolist()))
            == sorted(map(tuple, want.values.tolist())))
    # string first key buckets via FNV
    g2 = bucketed_agg(ds, "s", [("v", "max", "mx")]).to_pandas() \
        .sort_values("s").reset_index(drop=True)
    w2 = df.groupby("s")["v"].max().reset_index(name="mx")
    assert (g2["mx"].to_numpy(np.int64) == w2["mx"].to_numpy(np.int64)).all()


def test_bucketed_agg_rejects_unknown_fn(ray_session, frame):
    with pytest.raises(ValueError):
        bucketed_agg(ray.data.from_arrow(frame), "k",
                     [("v", "mean", "m")])


def test_bucketed_agg_null_keys_and_nonnull_count(ray_session):
    # null keys group (Arrow semantics) instead of crashing the bucket
    # hash; "count" counts NON-NULL values of the named column, so the
    # all-null-key group with null values reports 0 — the native-groupby
    # behavior bucketed_agg replaced
    t = pa.table({
        "s": pa.array(["a", None, "a", None, "b"]),
        "k": pa.array([1, None, 1, None, 2], pa.int64()),
        "v": pa.array([10, None, 30, None, 50], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    got = bucketed_agg(ds, "s", [("v", "count", "n"),
                                 ("v", "sum", "v_sum")]).to_pandas()
    by = {("" if s is None or (isinstance(s, float)) else s): (n, v)
          for s, n, v in zip(got["s"].tolist(), got["n"].tolist(),
                             got["v_sum"].tolist())}
    assert by["a"] == (2, 40)
    assert by["b"] == (1, 50)
    assert by[""][0] == 0  # null group: zero non-null values counted
    # int64 null key path
    got2 = bucketed_agg(ds, "k", [("v", "count", "n")]).to_pandas()
    ns = {(-1 if k != k else int(k)): int(n)
          for k, n in zip(got2["k"].astype("float").tolist(),
                          got2["n"].tolist())}
    assert ns[1] == 2 and ns[2] == 1 and ns[-1] == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _keyed_frames(draw):
    n = draw(st.integers(1, 120))
    keys = st.one_of(st.none(), st.sampled_from(["a", "b", "c", "dd"]))
    vals = st.one_of(st.none(), st.integers(-1000, 1000))
    return pa.table({
        "s": pa.array(draw(st.lists(keys, min_size=n, max_size=n))),
        "k": pa.array(draw(st.lists(
            st.one_of(st.none(), st.integers(-5, 5)),
            min_size=n, max_size=n)), pa.int64()),
        "v": pa.array(draw(st.lists(vals, min_size=n, max_size=n)),
                      pa.int64()),
    })


@given(_keyed_frames(), st.integers(1, 5), st.booleans())
@settings(max_examples=12, deadline=None)
def test_bucketed_agg_property_matches_single_table_arrow(
        ray_session, tbl, nparts, str_first):
    """Partition-invariance property: bucketed_agg over ANY block split
    equals ONE whole-table Arrow group_by — nulls in keys and values
    included (the exact semantics every call site previously got from a
    single-node Arrow aggregation)."""
    keys = ["s", "k"] if str_first else ["k", "s"]
    ds = ray.data.from_arrow(tbl).repartition(nparts)
    got = bucketed_agg(ds, keys, [("v", "sum", "v_sum"),
                                  ("v", "count", "n"),
                                  ("v", "min", "v_min")]).to_pandas()
    want = (tbl.group_by(keys)
            .aggregate([("v", "sum"), ("v", "count"), ("v", "min")])
            .rename_columns(keys + ["v_sum", "n", "v_min"]).to_pandas())
    key = lambda r: tuple("␀" if x is None or x != x else x for x in r)
    gm = {key(r[:2]): r[2:] for r in
          got[keys + ["v_sum", "n", "v_min"]].itertuples(index=False)}
    wm = {key(r[:2]): r[2:] for r in
          want[keys + ["v_sum", "n", "v_min"]].itertuples(index=False)}
    assert gm.keys() == wm.keys()
    for kk in wm:
        g, w = gm[kk], wm[kk]
        assert int(g[1]) == int(w[1]), (kk, "count")
        for gi, wi in ((g[0], w[0]), (g[2], w[2])):
            if wi is None or wi != wi:
                assert gi is None or gi != gi, kk
            else:
                assert int(gi) == int(wi), kk
