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
