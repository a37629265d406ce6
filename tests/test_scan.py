"""Distributed prefix-scan + token packing vs DuckDB window formulation."""

import duckdb
import numpy as np
import pandas as pd

import ray.data

from entity_linking_ray.stages.scan import pack_by_token_budget, prefix_sum


def _fixture(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(np.arange(10_000, dtype=np.int64))[:n]
    return pd.DataFrame({"doc_id": ids,
                         "n_tokens": rng.integers(1, 900, n, dtype=np.int64)})


def test_prefix_sum_matches_window(ray_session):
    df = _fixture()
    ds = ray.data.from_pandas(df).repartition(9)
    got = (prefix_sum(ds, order_col="doc_id", val_col="n_tokens",
                      out_col="running", num_buckets=13)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT doc_id, n_tokens,
               cast(sum(n_tokens) OVER (ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) as bigint) AS running
        FROM t ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(got[["doc_id", "n_tokens", "running"]],
                                  want, check_dtype=False)


def test_prefix_sum_driver_state_is_bucket_sized(ray_session):
    """Only O(num_buckets) totals reach the driver regardless of rows —
    the property that makes the scan scale-safe."""
    df = _fixture(n=2000)
    ds = ray.data.from_pandas(df).repartition(5)
    out = prefix_sum(ds, order_col="doc_id", val_col="n_tokens",
                     num_buckets=4).to_pandas()
    assert len(out) == len(df)
    assert out["running"].max() == df["n_tokens"].sum()


def test_pack_by_token_budget_matches_sql(ray_session):
    df = _fixture()
    ds = ray.data.from_pandas(df).repartition(9)
    got = (pack_by_token_budget(ds, order_col="doc_id",
                                tokens_col="n_tokens", capacity=1000,
                                num_buckets=13)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        WITH s AS (
          SELECT doc_id, n_tokens,
                 cast(sum(n_tokens) OVER (ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) as bigint) AS cum_tokens
          FROM t)
        SELECT doc_id, n_tokens, cum_tokens,
               cast((cum_tokens - n_tokens) // 1000 as bigint) AS bin_id
        FROM s ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_tokens", "cum_tokens", "bin_id"]], want,
        check_dtype=False)
    # every bin's first doc starts at an exclusive prefix inside that bin
    g = got.sort_values("cum_tokens")
    firsts = g.drop_duplicates("bin_id", keep="first")
    excl = firsts["cum_tokens"] - firsts["n_tokens"]
    assert (excl // 1000 == firsts["bin_id"]).all()


def test_oversized_doc_occupies_one_bin(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "n_tokens": np.array([10, 5000, 7, 8, 9],
                                            dtype=np.int64)})
    got = (pack_by_token_budget(ray.data.from_pandas(df),
                                order_col="doc_id", tokens_col="n_tokens",
                                capacity=100, num_buckets=2)
           .to_pandas().sort_values("doc_id"))
    assert got["bin_id"].tolist() == [0, 0, 50, 50, 50]


def test_global_rank_matches_argsort(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from entity_linking_ray.stages.scan import global_rank

    rng = np.random.default_rng(41)
    n = 1000
    t = pa.table({"rid": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(rng.integers(-500, 500, n), pa.int64())})
    out = global_rank(ray.data.from_arrow(t).repartition(7),
                      val_col="v", id_col="rid").to_pandas()
    df = t.to_pandas().sort_values(["v", "rid"]).reset_index(drop=True)
    df["want"] = np.arange(1, n + 1)
    got = out.set_index("rid")["rnk"]
    assert (got.loc[df["rid"]].to_numpy() == df["want"].to_numpy()).all()


def test_global_rank_degenerate_single_value(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from entity_linking_ray.stages.scan import global_rank

    # every row the same value: one bucket holds everything (the skew
    # worst case) — ranks must still be 1..n by id tie-break
    n = 200
    t = pa.table({"rid": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(np.full(n, 7), pa.int64())})
    out = global_rank(ray.data.from_arrow(t).repartition(4),
                      val_col="v", id_col="rid").to_pandas()
    got = out.sort_values("rid")["rnk"].to_numpy()
    assert (got == np.arange(1, n + 1)).all()


def test_scan_family_empty_input_returns_typed_empty(ray_session):
    """Empty in -> typed empty out for prefix_sum / pack / global_rank
    (the behavior pinned for the window family; previously an opaque
    TypeError from int(None) in the bounds aggregate)."""
    import pyarrow as pa

    import ray.data
    from entity_linking_ray.stages.scan import (global_rank,
                                                pack_by_token_budget,
                                                prefix_sum)

    empty = ray.data.from_arrow(pa.table({
        "rid": pa.array([], pa.int64()),
        "v": pa.array([], pa.int64()),
    }))
    ps = prefix_sum(empty, order_col="rid", val_col="v", out_col="running")
    assert ps.count() == 0
    assert set(ps.schema().names) == {"rid", "v", "running"}

    pk = pack_by_token_budget(empty, order_col="rid", tokens_col="v",
                              capacity=10)
    assert pk.count() == 0
    assert set(pk.schema().names) == {"rid", "v", "cum_tokens", "bin_id"}

    gr = global_rank(empty, val_col="v", id_col="rid")
    assert gr.count() == 0
    assert set(gr.schema().names) == {"rid", "v", "rnk"}


def test_equi_depth_buckets_balance_skewed_values(ray_session):
    """A heavily skewed (but distinct) value column must still spread
    across buckets: with uniform min/max-width bounds, v = i**4 piles
    ~1/3 of the rows into bucket 0; the equi-depth sketch boundaries
    must keep every bucket under ~2x the mean occupancy — and the
    global rank over the skewed column stays exact."""
    import pyarrow as pa

    from entity_linking_ray.stages.scan import (_bucket_boundaries,
                                                global_rank)

    n, k = 8000, 32
    vals = (np.arange(n, dtype=np.int64) ** 4)  # long right tail
    rng = np.random.default_rng(11)
    perm = rng.permutation(n)
    t = pa.table({"rid": pa.array(np.arange(n, dtype=np.int64)[perm]),
                  "v": pa.array(vals[perm])})
    ds = ray.data.from_arrow(t).repartition(8).materialize()

    bounds = _bucket_boundaries(ds, "v", k)
    occ = np.bincount(np.searchsorted(bounds, vals, side="right"))
    assert occ.max() <= 2.0 * occ.mean(), occ.tolist()

    out = global_rank(ds, val_col="v", id_col="rid",
                      num_buckets=k).to_pandas()
    got = out.sort_values("v")["rnk"].to_numpy()
    assert (got == np.arange(1, n + 1)).all()
