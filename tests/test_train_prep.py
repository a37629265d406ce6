"""Train-prep operators: split determinism, hard-negative construction,
writers round-trip."""

import pyarrow as pa
import pytest

import ray
import ray.data

from entity_linking_ray.pipelines.train_prep import sample_hard_negatives, train_test_split
from entity_linking_ray.sources.writers import (
    read_text_lines, write_jsonl, write_parquet_partitioned,
)


def test_split_deterministic_and_proportional():
    ds = ray.data.range(1000)
    tr1, te1 = train_test_split(ds, test_fraction=0.3, seed=7)
    tr2, te2 = train_test_split(ray.data.range(1000), test_fraction=0.3, seed=7)
    assert tr1.count() == 700 and te1.count() == 300
    assert sorted(r["id"] for r in tr1.take_all()) == sorted(r["id"] for r in tr2.take_all())
    # train ∪ test = all, disjoint
    all_ids = {r["id"] for r in tr1.take_all()} | {r["id"] for r in te1.take_all()}
    assert len(all_ids) == 1000


def test_hard_negatives(corpus):
    gold = ray.data.from_arrow(corpus["mentions_gold"]).limit(200)
    from entity_linking_ray.stages.candidates import make_kb_blob

    blob = make_kb_blob(corpus["entities"])
    out = sample_hard_negatives(gold, blob["alias_to_ids"], n_negatives=2).to_pandas()
    assert (out["label"].isin([0, 1])).all()
    pos = out[out.label == 1]
    neg = out[out.label == 0]
    assert len(pos) > 0
    # every negative shares the mention's alias block but is not the gold
    merged = neg.merge(pos, on=["doc_id", "span_idx", "offset"], suffixes=("_n", "_p"))
    assert (merged["entity_id_n"] != merged["entity_id_p"]).all()
    # per mention at most 2 negatives
    assert neg.groupby(["doc_id", "span_idx", "offset"]).size().max() <= 2
    # deterministic
    out2 = sample_hard_negatives(gold, blob["alias_to_ids"], n_negatives=2).to_pandas()
    assert out.sort_values(list(out.columns)).reset_index(drop=True).equals(
        out2.sort_values(list(out.columns)).reset_index(drop=True))


def test_writers_roundtrip(tmp_path):
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    ds = ray.data.from_arrow(t)
    pdir = write_parquet_partitioned(ds, str(tmp_path / "pq"), rows_per_file=2)
    back = ray.data.read_parquet(pdir).to_pandas().sort_values("a").reset_index(drop=True)
    assert back["a"].tolist() == [1, 2, 3]
    jdir = write_jsonl(ds, str(tmp_path / "jl"))
    jback = ray.data.read_json(jdir).to_pandas().sort_values("a")
    assert jback["b"].tolist() == ["x", "y", "z"]


def test_hash_split_properties():
    """Hash-bucket holdout: proportion near test_pct, assignment a pure
    key function (repartition-stable, incremental-consistent), all rows
    of one key on one side."""
    from entity_linking_ray.pipelines.train_prep import hash_split

    t = pa.table({"doc_id": list(range(5000)) + list(range(100))})
    ds = ray.data.from_arrow(t)
    out = hash_split(ds, "doc_id").to_pandas()
    frac = (out["split"] == "test").mean()
    assert 0.25 < frac < 0.35
    # leakage-free by key: duplicate keys agree
    assert (out.groupby("doc_id")["split"].nunique() == 1).all()
    # repartition-stable
    out2 = hash_split(ds.repartition(7), "doc_id").to_pandas()
    a = out.sort_values(["doc_id", "split"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "split"]).reset_index(drop=True)
    assert a.equals(b)
    # incremental-consistent: a subset batch gets the same assignment
    sub = hash_split(ray.data.from_arrow(t.slice(0, 50)), "doc_id").to_pandas()
    m = sub.merge(out.drop_duplicates("doc_id"), on="doc_id", suffixes=("_s", "_f"))
    assert (m["split_s"] == m["split_f"]).all()


def test_mixture_sample_tokens(ray_session):
    """Keep-set must equal the integer-threshold rule computed brute-force
    (budgeted group down-sampled, over-budgeted group clamped to keep-all,
    unbudgeted group kept whole); deterministic across repartitioning."""
    import numpy as np

    from entity_linking_ray.functions.hashing import hash_strings
    from entity_linking_ray.pipelines.train_prep import mixture_sample_tokens

    rng = np.random.default_rng(11)
    rows = []
    for i in range(600):
        grp = ["a", "b", "c"][i % 3]
        n_tok = int(rng.integers(5, 40))
        rows.append((i, grp, " ".join(["w"] * n_tok)))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })
    budgets = {"a": 1000, "b": 10_000_000}  # c unbudgeted
    SCALE = 1_000_000
    totals = {}
    for _, g, tx in rows:
        totals[g] = totals.get(g, 0) + len(tx.split(" "))
    thresh = {g: (min(SCALE, budgets[g] * SCALE // tot) if g in budgets else SCALE)
              for g, tot in totals.items()}
    expect = {i for i, g, _ in rows
              if hash_strings([str(i)])[0] % SCALE < thresh[g]}

    ds = ray.data.from_arrow(t)
    out = mixture_sample_tokens(ds, budgets).to_pandas()
    assert set(out["doc_id"]) == expect
    # clamped + unbudgeted groups keep every row
    assert (out["source"] == "b").sum() == 200
    assert (out["source"] == "c").sum() == 200
    # budgeted group actually down-sampled, in the budget's neighborhood
    a_tokens = out[out["source"] == "a"]["n_tokens"].sum()
    assert 0 < a_tokens < totals["a"]
    # n_tokens column matches the whitespace count
    row = out.iloc[0]
    assert row["n_tokens"] == len(
        t["text"][int(row["doc_id"])].as_py().split(" "))
    # partition-invariant
    out2 = mixture_sample_tokens(ds.repartition(7), budgets).to_pandas()
    assert set(out2["doc_id"]) == expect
