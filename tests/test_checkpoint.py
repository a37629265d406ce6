"""Per-partition checkpoint/resume: kill/resume semantics via lineage."""

import json
import os
import shutil

import pyarrow as pa
import pytest

import ray
import ray.data

from entity_linking_ray.state.checkpoint import (
    checkpoint_partitioned, completed_partitions, stage_digest,
)


@pytest.fixture
def tmp_stage(tmp_path):
    return str(tmp_path / "stage")


def _ds(n=100):
    return ray.data.from_arrow(pa.table({
        "doc_id": [f"d{i:04d}" for i in range(n)],
        "score": [float(i) for i in range(n)],
    }))


def test_checkpoint_roundtrip_and_lineage(tmp_stage):
    digest = stage_digest("input-v1")
    out = checkpoint_partitioned(_ds(), tmp_stage, "doc_id", digest, num_partitions=4)
    df = out.to_pandas()
    assert len(df) == 100 and set(df.columns) == {"doc_id", "score"}
    assert completed_partitions(tmp_stage, digest) == {0, 1, 2, 3}
    # lineage carries metrics
    with open(os.path.join(tmp_stage, "lineage", "part-0.json")) as fh:
        meta = json.load(fh)
    assert meta["metrics"]["rows"] > 0 and "score" in meta["metrics"]


def test_resume_skips_completed_partitions(tmp_stage):
    digest = stage_digest("input-v1")
    checkpoint_partitioned(_ds(), tmp_stage, "doc_id", digest, num_partitions=4)
    # simulate a crash: partition 2 lost (data + lineage)
    shutil.rmtree(os.path.join(tmp_stage, "part-2"))
    os.remove(os.path.join(tmp_stage, "lineage", "part-2.json"))
    before = {p: os.path.getmtime(os.path.join(tmp_stage, f"part-{p}"))
              for p in (0, 1, 3)}
    out = checkpoint_partitioned(_ds(), tmp_stage, "doc_id", digest, num_partitions=4)
    assert len(out.to_pandas()) == 100
    # untouched completed partitions were not rewritten
    for p, mtime in before.items():
        assert os.path.getmtime(os.path.join(tmp_stage, f"part-{p}")) == mtime


def test_digest_change_recomputes(tmp_stage):
    d1 = stage_digest("input-v1")
    checkpoint_partitioned(_ds(), tmp_stage, "doc_id", d1, num_partitions=2)
    d2 = stage_digest("input-v2")
    assert completed_partitions(tmp_stage, d2) == set()
    checkpoint_partitioned(_ds(150), tmp_stage, "doc_id", d2, num_partitions=2)
    assert completed_partitions(tmp_stage, d2) == {0, 1}
    assert len(ray.data.read_parquet(tmp_stage + "/part-0").to_pandas()) + \
        len(ray.data.read_parquet(tmp_stage + "/part-1").to_pandas()) == 150


def test_resumable_pipeline_skips_on_rerun(corpus, tmp_path):
    """Flagship resume: second run with identical inputs recomputes nothing
    (checkpoint partitions untouched) and yields the same clusters."""
    import os

    import ray.data

    from entity_linking_ray.pipelines.link_and_cluster import run_pipeline_resumable

    run_dir = str(tmp_path / "run")
    docs = ray.data.from_arrow(corpus["documents"])
    out1 = run_pipeline_resumable(docs, corpus["entities"], run_dir,
                                  concurrency=2, num_partitions=4,
                                  checkpoint_partitions=4)
    c1 = out1["clusters"].to_pandas().sort_values(
        ["doc_id", "span_idx", "offset"]).reset_index(drop=True)
    mtimes = {
        p: os.path.getmtime(os.path.join(run_dir, "scored", p))
        for p in os.listdir(os.path.join(run_dir, "scored")) if p.startswith("part-")
    }
    out2 = run_pipeline_resumable(docs, corpus["entities"], run_dir,
                                  concurrency=2, num_partitions=4,
                                  checkpoint_partitions=4)
    c2 = out2["clusters"].to_pandas().sort_values(
        ["doc_id", "span_idx", "offset"]).reset_index(drop=True)
    for p, t in mtimes.items():
        assert os.path.getmtime(os.path.join(run_dir, "scored", p)) == t
    assert c1["cluster_id"].nunique() == c2["cluster_id"].nunique()
    assert (c1[["doc_id", "span_idx", "offset"]] == c2[["doc_id", "span_idx", "offset"]]).all().all()


def test_zero_row_partitions_get_lineage(tmp_stage):
    """Partitions with no rows must still be marked complete — otherwise
    every resume recomputes the whole upstream just to rediscover them."""
    digest = stage_digest("input-v1")
    # 2 rows into 8 partitions → most pids are empty
    ds = ray.data.from_arrow(pa.table({"doc_id": ["a", "b"], "v": [1, 2]}))
    out = checkpoint_partitioned(ds, tmp_stage, "doc_id", digest, num_partitions=8)
    assert len(out.to_pandas()) == 2
    assert completed_partitions(tmp_stage, digest) == set(range(8))
    # rerun: nothing recomputed, nothing rewritten
    mtimes = {p: os.path.getmtime(os.path.join(tmp_stage, f"part-{p}"))
              for p in range(8)}
    out2 = checkpoint_partitioned(ds, tmp_stage, "doc_id", digest, num_partitions=8)
    assert len(out2.to_pandas()) == 2
    for p, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(tmp_stage, f"part-{p}")) == mt


def test_resumable_digest_tracks_inputs():
    """The resume digest must change when KB content or the partition
    modulus changes — same row COUNT is not identity."""
    from entity_linking_ray.state.checkpoint import table_fingerprint

    t1 = pa.table({"entity_id": ["E1"], "subject": ["Acme"]})
    t2 = pa.table({"entity_id": ["E1"], "subject": ["Acme Corp"]})  # same rows
    assert table_fingerprint(t1) != table_fingerprint(t2)
    assert stage_digest("a", table_fingerprint(t1)) != stage_digest("a", table_fingerprint(t2))
