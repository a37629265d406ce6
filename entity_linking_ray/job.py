"""`ray job submit` entry point for the flagship link-and-cluster run.

The north rule's deployment shape is ``ray job submit -- python -m
entity_linking_ray.job --docs <dir> --entities <parquet> --output
<dir>``: the job connects to whatever cluster the Job API placed it on
(``ray.init(address="auto")`` when RAY_ADDRESS is set by the job
runtime; a fresh local session otherwise, so the same command works for
smoke runs), streams the documents through the pipeline, and writes the
result tables as partitioned parquet under ``--output``:

    <output>/links/      one file per block — resumable consumers
    <output>/clusters/
    <output>/summary.json   row counts + params + elapsed

``--resume-dir`` switches to the checkpointed pipeline
(per-partition lineage under the given directory; a rerun after a crash
skips finished partitions — ``state/checkpoint.py``).

This module is a CLI: it OWNS a Ray session (the library never calls
ray.init — driver/bench/pytest own theirs; job submission is the same
contract).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _read_docs(path: str):
    import ray.data

    from .sources.documents import read_table

    return read_table(path)


def _read_entities(path: str | None):
    if path is None:
        from .testdata import derive_entities

        return derive_entities()
    import pyarrow.parquet as pq

    return pq.read_table(path)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m entity_linking_ray.job",
        description="Link-and-cluster a document corpus on a Ray cluster.")
    ap.add_argument("--docs", required=True,
                    help="documents table: parquet file/dir or Lance dir")
    ap.add_argument("--entities", default=None,
                    help="entity KB parquet (entity_id, subject, aliases); "
                         "default: the built-in derived KB")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--resume-dir", default=None,
                    help="checkpoint directory: use the resumable pipeline "
                         "with per-partition lineage under this path")
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--num-partitions", type=int, default=0,
                    help="join/shuffle width (0 = derive from cluster size)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--hot-cap", type=int, default=50_000)
    ap.add_argument("--ann-k", type=int, default=5,
                    help="dense-backfill width (0 = exact channel only)")
    ap.add_argument("--threshold", type=float, default=None,
                    help="link-acceptance score threshold")
    ap.add_argument("--score-weights", default=None, metavar="WSTR,WCOS",
                    help="scorer weights, e.g. '1.0,0.0' for the "
                         "deterministic strsim-only configuration")
    ap.add_argument("--lexical-channel", action="store_true",
                    help="enable the BM25-style third candidate source")
    ap.add_argument("--oov-channel", action="store_true",
                    help="enable the statistical OOV mention proposer")
    ap.add_argument("--near-dup-edges", action="store_true",
                    help="add MinHash-LSH mention-mention edges (general CC)")
    ap.add_argument("--sn-edges", action="store_true",
                    help="add sorted-neighborhood mention-mention edges")
    args = ap.parse_args(argv)
    weights = None
    if args.score_weights:
        try:
            weights = tuple(float(x) for x in args.score_weights.split(","))
        except ValueError:
            ap.error(f"--score-weights must be WSTR,WCOS "
                     f"(two floats): {args.score_weights!r}")
        if len(weights) != 2:  # fail at parse time, not mid-pipeline
            ap.error(f"--score-weights takes exactly two weights "
                     f"(WSTR,WCOS), got {len(weights)}: "
                     f"{args.score_weights!r}")

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; for a
        # bare local smoke run it is unset and a local session starts
        ray.init(address=os.environ.get("RAY_ADDRESS") or "local",
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from .pipelines.link_and_cluster import run_pipeline, run_pipeline_resumable

    nparts = args.num_partitions or max(
        8, int(ray.cluster_resources().get("CPU", 8)))
    docs = _read_docs(args.docs)
    entities = _read_entities(args.entities)

    t0 = time.time()
    if args.resume_dir:
        if (args.lexical_channel or args.oov_channel or args.near_dup_edges
                or args.sn_edges):
            ap.error("--resume-dir supports the default channel config only "
                     "(the checkpoint digest does not cover channel flags)")
        out = run_pipeline_resumable(
            docs, entities, args.resume_dir,
            k=args.k, ann_k=args.ann_k, threshold=args.threshold,
            score_weights=weights, concurrency=(1, args.concurrency),
            hot_cap=args.hot_cap, num_partitions=nparts)
    else:
        out = run_pipeline(
            docs, entities, k=args.k, ann_k=args.ann_k,
            threshold=args.threshold, score_weights=weights,
            lexical_channel=args.lexical_channel,
            oov_channel=args.oov_channel,
            near_dup_edges=args.near_dup_edges, sn_edges=args.sn_edges,
            concurrency=(1, args.concurrency),
            hot_cap=args.hot_cap, num_partitions=nparts, annotate=None)

    os.makedirs(args.output, exist_ok=True)
    counts = {}
    for name in ("links", "clusters"):
        path = os.path.join(args.output, name)
        out[name].write_parquet(path)
        counts[name] = ray.data.read_parquet(path).count()
    summary = {
        "elapsed_sec": round(time.time() - t0, 3),
        "rows": counts,
        "num_partitions": nparts,
        "docs": args.docs,
        "resume_dir": args.resume_dir,
    }
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
