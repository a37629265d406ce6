"""Deterministic sampling, sketches, existence joins, bounded frames."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from entity_linking_ray.stages.joins import anti_join, semi_join
from entity_linking_ray.stages.sampling import (_A, _B, _M, _u01,
                                                stratified_sample,
                                                weighted_sample)
from entity_linking_ray.stages.sketch import (_hll_estimate, _hll_registers,
                                              heavy_hitter_words,
                                              hll_distinct)
from entity_linking_ray.stages.windows import (grouped_first_last,
                                               grouped_rolling_window)


# ---------------------------------------------------------------- sampling


def _docs(n, langs=("en", "de", "fr")):
    rng = np.random.default_rng(7)
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "lang": pa.array([langs[i % len(langs)] for i in range(n)]),
        "n_chars": pa.array(rng.integers(1, 500, n), pa.int64()),
    })


def test_stratified_sample_matches_reference(ray_session):
    t = _docs(300)
    out = stratified_sample(ray.data.from_arrow(t).repartition(7),
                            key_col="lang", id_col="doc_id", n_per_key=10,
                            keep_cols=("n_chars",)).to_pandas()
    df = t.to_pandas()
    df["h"] = (df["doc_id"] * _A + _B) % _M
    exp = (df.sort_values(["h", "doc_id"]).groupby("lang").head(10))
    assert len(out) == 30
    for lang in ("en", "de", "fr"):
        got = set(out[out["lang"] == lang]["doc_id"])
        want = set(exp[exp["lang"] == lang]["doc_id"])
        assert got == want
    # keep_cols survive with correct values
    merged = out.merge(df[["doc_id", "n_chars"]], on="doc_id",
                       suffixes=("", "_ref"))
    assert (merged["n_chars"] == merged["n_chars_ref"]).all()


def test_stratified_sample_small_stratum_returns_all(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "lang": pa.array(["en", "en", "xx"]),
                  "n_chars": pa.array([5, 6, 7], pa.int64())})
    out = stratified_sample(ray.data.from_arrow(t), key_col="lang",
                            id_col="doc_id", n_per_key=10).to_pandas()
    assert len(out) == 3


def test_weighted_sample_matches_brute_force(ray_session):
    t = _docs(500)
    out = weighted_sample(ray.data.from_arrow(t).repartition(9),
                          id_col="doc_id", weight_col="n_chars",
                          k=40).to_pandas()
    df = t.to_pandas()
    key = _u01(df["doc_id"].to_numpy()) ** (1.0 / df["n_chars"].to_numpy())
    df["key"] = key
    want = df.sort_values(["key", "doc_id"],
                          ascending=[False, True]).head(40)
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])
    # partitioning-independence: different block structure, same sample
    out2 = weighted_sample(ray.data.from_arrow(t).repartition(2),
                           id_col="doc_id", weight_col="n_chars",
                           k=40).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_weighted_sample_excludes_nonpositive_weights(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "w": pa.array([0, -5, 3, 9], pa.int64())})
    out = weighted_sample(ray.data.from_arrow(t), id_col="doc_id",
                          weight_col="w", k=10).to_pandas()
    assert sorted(out["doc_id"]) == [3, 4]


# ----------------------------------------------------------------- sketches


def test_hll_registers_merge_is_union():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**63, 4000, dtype=np.uint64)
    b = rng.integers(0, 2**63, 4000, dtype=np.uint64)
    p = 12
    merged = np.maximum(_hll_registers(a, p), _hll_registers(b, p))
    direct = _hll_registers(np.concatenate([a, b]), p)
    assert np.array_equal(merged, direct)


def test_hll_estimate_accuracy():
    rng = np.random.default_rng(11)
    for true_n in (100, 5_000, 200_000):
        h = rng.integers(0, 2**64, true_n, dtype=np.uint64)
        est = _hll_estimate(_hll_registers(np.unique(h), 12))
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_distinct_small_cardinality_exact(ray_session):
    # 15 distinct users → linear-counting regime → exact
    t = pa.table({
        "event_type": pa.array(["a"] * 60 + ["b"] * 40),
        "user_id": pa.array([i % 15 for i in range(60)]
                            + [i % 10 for i in range(40)], pa.int64()),
    })
    out = hll_distinct(ray.data.from_arrow(t).repartition(5),
                       key_col="event_type",
                       val_col="user_id").to_pandas()
    got = dict(zip(out["event_type"], out["approx_distinct"]))
    assert got == {"a": 15, "b": 10}


def test_heavy_hitters_exact_top_k(ray_session):
    words = (["alpha"] * 50 + ["beta"] * 40 + ["gamma"] * 30
             + ["delta"] * 20 + [f"rare{i}" for i in range(200)])
    rng = np.random.default_rng(5)
    rng.shuffle(words)
    docs = [" ".join(words[i::10]) for i in range(10)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs)})) \
        .repartition(4)
    out = heavy_hitter_words(ds, text_col="text", k=3,
                             width=64).to_pandas()
    assert list(out["word"]) == ["alpha", "beta", "gamma"]
    assert list(out["n"]) == [50, 40, 30]


def test_heavy_hitters_uncertifiable_raises(ray_session):
    # all-unique tokens: k-th count 1 can never clear the MG bound
    docs = [" ".join(f"u{i}_{j}" for j in range(300)) for i in range(4)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs)}))
    with pytest.raises(ValueError, match="cannot certify"):
        heavy_hitter_words(ds, text_col="text", k=5, width=16)


# ----------------------------------------------------------- existence joins


def _lr():
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "payload": pa.array(["a", "b", "c", "d"]),
    }))
    # duplicate right keys must not multiply left rows
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 2, 2, 4, 9], pa.int64()),
        "junk": pa.array([0, 1, 2, 3, 4], pa.int64()),
    }))
    return left, right


def test_semi_join_no_duplication(ray_session):
    left, right = _lr()
    out = semi_join(left, right, on=("k",), right_on=("rk",),
                    num_partitions=4).to_pandas()
    assert sorted(out["k"]) == [2, 4]
    assert set(out.columns) == {"k", "payload"}


def test_anti_join_drops_matches(ray_session):
    left, right = _lr()
    out = anti_join(left, right, on=("k",), right_on=("rk",),
                    num_partitions=4).to_pandas()
    assert sorted(out["k"]) == [1, 3]
    assert set(out.columns) == {"k", "payload"}


# ----------------------------------------------------------- window frames


def test_grouped_rolling_window_vs_pandas(ray_session):
    rng = np.random.default_rng(2)
    n = 400
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 9, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10**9, n), pa.timestamp("us")),
        "value": pa.array(rng.normal(10, 3, n), pa.float64()),
    })
    out = grouped_rolling_window(
        ray.data.from_arrow(t).repartition(6), key_col="user_id",
        ts_col="ts", id_col="event_id", val_col="value",
        window_rows=3).to_pandas().sort_values(
            ["user_id", "t", "event_id"]).reset_index(drop=True)
    df = t.to_pandas()
    df["t"] = df["ts"].astype("int64")
    df["units"] = (df["value"] * 100).round().astype("int64")
    df = df.sort_values(["user_id", "t", "event_id"]).reset_index(drop=True)
    g = df.groupby("user_id")["units"]
    df["win_units"] = g.transform(
        lambda s: s.rolling(3, min_periods=1).sum()).astype("int64")
    df["win_n"] = g.transform(
        lambda s: s.rolling(3, min_periods=1).count()).astype("int64")
    assert (out["win_units"].to_numpy() == df["win_units"].to_numpy()).all()
    assert (out["win_n"].to_numpy() == df["win_n"].to_numpy()).all()


def test_grouped_first_last_vs_pandas(ray_session):
    rng = np.random.default_rng(4)
    n = 300
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 12, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10**7, n), pa.timestamp("us")),
        "event_type": pa.array(
            [f"t{int(x)}" for x in rng.integers(0, 5, n)]),
    })
    out = grouped_first_last(
        ray.data.from_arrow(t).repartition(7), key_col="user_id",
        ts_col="ts", id_col="event_id",
        val_col="event_type").to_pandas()
    df = t.to_pandas()
    df["t"] = df["ts"].astype("int64")
    df = df.sort_values(["user_id", "t", "event_id"])
    first = df.groupby("user_id")["event_type"].first()
    last = df.groupby("user_id")["event_type"].last()
    n_ev = df.groupby("user_id").size()
    got = out.set_index("user_id").sort_index()
    assert (got["first_val"] == first.sort_index()).all()
    assert (got["last_val"] == last.sort_index()).all()
    assert (got["n_events"] == n_ev.sort_index()).all()


def test_bloom_filter_basics():
    from entity_linking_ray.functions.bloom import (bloom_build,
                                                    bloom_might_contain)

    rng = np.random.default_rng(9)
    present = rng.integers(0, 2**63, 5000, dtype=np.int64)
    absent = rng.integers(0, 2**63, 5000, dtype=np.int64)
    absent = np.setdiff1d(absent, present)
    words = bloom_build(present, n_bits=1 << 20)
    # no false negatives, ever
    assert bloom_might_contain(words, present).all()
    # false-positive rate bounded (expected ~0.2% at this load)
    fp = bloom_might_contain(words, absent).mean()
    assert fp < 0.02, fp
    # partial merge ≡ whole build
    merged = (bloom_build(present[:2500], n_bits=1 << 20)
              | bloom_build(present[2500:], n_bits=1 << 20))
    assert np.array_equal(merged, words)


def test_bloom_prefiltered_joins_match_plain(ray_session):
    rng = np.random.default_rng(13)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 10_000, 3000), pa.int64()),
        "payload": pa.array([f"p{i}" for i in range(3000)]),
    })).repartition(5)
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array(rng.integers(0, 10_000, 400), pa.int64()),
    })).repartition(3)

    for fn in (anti_join, semi_join):
        plain = fn(left, right, on=("k",), right_on=("rk",),
                   num_partitions=4).to_pandas()
        bloom = fn(left, right, on=("k",), right_on=("rk",),
                   num_partitions=4, bloom_bits=1 << 16).to_pandas()
        a = plain.sort_values(["k", "payload"]).reset_index(drop=True)
        b = bloom.sort_values(["k", "payload"]).reset_index(drop=True)
        assert a.equals(b), fn.__name__


def test_grouped_ordered_concat_vs_pandas(ray_session):
    from entity_linking_ray.stages.windows import grouped_ordered_concat

    rng = np.random.default_rng(21)
    n = 250
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 8, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10**6, n), pa.timestamp("us")),
        "event_type": pa.array(
            [f"e{int(x)}" for x in rng.integers(0, 4, n)]),
    })
    out = grouped_ordered_concat(
        ray.data.from_arrow(t).repartition(5), key_col="user_id",
        ts_col="ts", id_col="event_id",
        val_col="event_type").to_pandas().set_index("user_id").sort_index()
    df = t.to_pandas()
    df["t"] = df["ts"].astype("int64")
    df = df.sort_values(["user_id", "t", "event_id"])
    want = df.groupby("user_id")["event_type"].agg(",".join)
    assert (out["seq"] == want.sort_index()).all()
    assert (out["n_events"]
            == df.groupby("user_id").size().sort_index()).all()


def test_new_window_ops_empty_input(ray_session):
    from entity_linking_ray.stages.windows import (grouped_first_last,
                                                   grouped_ordered_concat,
                                                   grouped_rolling_window)

    t = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
        "event_type": pa.array([], pa.string()),
    })
    ds = ray.data.from_arrow(t)
    kw = dict(key_col="user_id", ts_col="ts", id_col="event_id")
    assert grouped_rolling_window(ds, **kw, val_col="value",
                                  window_rows=3).count() == 0
    assert grouped_first_last(ds, **kw, val_col="event_type").count() == 0
    assert grouped_ordered_concat(ds, **kw, val_col="event_type").count() == 0


def test_approx_quantiles_rank_error_bound(ray_session):
    """Sketch quantiles vs exact on 200k skewed values: rank error of
    every estimate under 1.5 * N / sketch_size (the two-level compaction
    bound), and the sketch is deterministic across runs."""
    from entity_linking_ray.stages.sketch import approx_quantiles

    rng = np.random.default_rng(5)
    vals = (rng.lognormal(3.0, 1.2, 200_000) * 100).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})) \
        .repartition(32).materialize()
    qs = (0.1, 0.25, 0.5, 0.9, 0.99)
    out = (approx_quantiles(ds, val_col="v", qs=qs, sketch_size=256)
           .to_pandas().sort_values("q").reset_index(drop=True))
    assert out["q"].tolist() == list(qs)
    s = np.sort(vals)
    n = len(s)
    budget = 1.5 * n / 256
    for q, est in zip(out["q"], out["value"]):
        est_rank = np.searchsorted(s, est, side="right")
        assert abs(est_rank - q * n) <= budget, (q, est_rank, q * n)
    out2 = (approx_quantiles(ds, val_col="v", qs=qs, sketch_size=256)
            .to_pandas().sort_values("q").reset_index(drop=True))
    assert (out2["value"].values == out["value"].values).all()


def test_table_digest_partition_and_order_invariant(ray_session):
    """The digest is identical under any repartitioning/row order and
    changes when any row's content changes."""
    import pyarrow as pa
    import ray.data

    from entity_linking_ray.stages.sketch import table_digest

    t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                  "text": pa.array([f"doc body {i}" for i in range(100)])})
    base = table_digest(ray.data.from_arrow(t),
                        cols=["doc_id", "text"]).to_pandas()
    assert int(base["n_rows"].iloc[0]) == 100
    for nparts in (1, 7):
        perm = t.take(pa.array(list(reversed(range(100)))))
        d2 = table_digest(ray.data.from_arrow(perm).repartition(nparts),
                          cols=["doc_id", "text"]).to_pandas()
        assert int(d2["digest"].iloc[0]) == int(base["digest"].iloc[0])
        assert int(d2["n_rows"].iloc[0]) == 100
    mutated = t.set_column(1, "text", pa.array(
        [f"doc body {i}" if i != 50 else "tampered" for i in range(100)]))
    d3 = table_digest(ray.data.from_arrow(mutated),
                      cols=["doc_id", "text"]).to_pandas()
    assert int(d3["digest"].iloc[0]) != int(base["digest"].iloc[0])
