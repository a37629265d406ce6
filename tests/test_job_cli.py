"""`python -m entity_linking_ray.job` — the ray-job-submit entry point."""

import json
import os
import subprocess
import sys

import ray
import ray.data


def test_job_cli_end_to_end(tmp_path, ray_session):
    from entity_linking_ray.testdata import derive_documents

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    derive_documents("/root/testdata/sf0.001").write_parquet(docs_dir)

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # the subprocess owns a local session
    res = subprocess.run(
        [sys.executable, "-m", "entity_linking_ray.job",
         "--docs", docs_dir, "--output", out_dir, "--concurrency", "2",
         "--num-partitions", "4"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["rows"]["links"] > 0
    assert summary["rows"]["clusters"] == summary["rows"]["links"]
    # partitioned parquet output + summary on disk
    assert os.path.isdir(os.path.join(out_dir, "links"))
    assert os.path.exists(os.path.join(out_dir, "summary.json"))
    got = ray.data.read_parquet(os.path.join(out_dir, "clusters"))
    assert got.count() == summary["rows"]["clusters"]
