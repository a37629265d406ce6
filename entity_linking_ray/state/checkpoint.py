"""Per-partition checkpointing with lineage + metrics (resume support).

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics — any partition can resume without recomputing upstream
blocks". Reference analogue: pickle-per-stage caching with
load-or-generate guards (``process_wikidata.py:35-37``,
``eval_biencoder_.py:196-220`` — SURVEY.md S12), upgraded to:

- deterministic hash partitioning on a key column (``pid = hash(key) % P``)
- one parquet directory per partition, written atomically (tmp + rename)
- ``lineage/part-<pid>.json`` per partition: input digest, row count,
  numeric-column metric summaries, written AFTER the data — a partition
  with lineage is complete by construction
- resume = compute only partitions whose lineage is missing or whose
  input digest changed; finished partitions are never touched.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.hashing import hash_strings


def _lineage_dir(stage_dir: str) -> str:
    return os.path.join(stage_dir, "lineage")


def completed_partitions(stage_dir: str, input_digest: str) -> set[int]:
    out = set()
    ldir = _lineage_dir(stage_dir)
    if not os.path.isdir(ldir):
        return out
    for f in os.listdir(ldir):
        if not f.startswith("part-") or not f.endswith(".json"):
            continue
        try:
            with open(os.path.join(ldir, f)) as fh:
                meta = json.load(fh)
            if meta.get("input_digest") == input_digest:
                out.add(int(meta["pid"]))
        except (ValueError, KeyError, json.JSONDecodeError):
            continue
    return out


def _metrics(tbl: pa.Table) -> dict:
    import pyarrow.compute as pc

    m: dict = {"rows": tbl.num_rows}
    for field in tbl.schema:
        if pa.types.is_floating(field.type) or pa.types.is_integer(field.type):
            col = tbl[field.name]
            if tbl.num_rows:
                m[field.name] = {
                    "min": pc.min(col).as_py(), "max": pc.max(col).as_py(),
                    "mean": float(pc.mean(col).as_py() or 0.0),
                }
    return m


def checkpoint_partitioned(ds: ray.data.Dataset, stage_dir: str, key_col: str,
                           input_digest: str, num_partitions: int = 16) -> ray.data.Dataset:
    """Write *ds* to ``stage_dir`` as ``part-<pid>/`` parquet dirs with
    per-partition lineage; skip partitions already complete for the same
    input digest. Returns a Dataset reading the full checkpoint.

    The write path streams: each missing partition's rows are selected by
    a vectorized pid filter (no full materialization of the input on the
    driver). Partition count is the resume granularity knob — at 100-TB
    scale it maps to input shards (one pid per input file range).
    """
    os.makedirs(_lineage_dir(stage_dir), exist_ok=True)
    done = completed_partitions(stage_dir, input_digest)
    missing = sorted(set(range(num_partitions)) - done)

    if missing:
        def add_pid(batch: pa.Table) -> pa.Table:
            pid = hash_strings([str(v) for v in batch[key_col].to_pylist()]) % num_partitions
            return batch.append_column("__pid", pa.array(pid, pa.int64()))

        with_pid = ds.map_batches(add_pid, batch_format="pyarrow")
        todo = with_pid.map_batches(
            lambda b: b.filter(
                pa.compute.is_in(b["__pid"], value_set=pa.array(missing, pa.int64()))
            ),
            batch_format="pyarrow",
        )

        # one pass: route rows to per-partition in-memory tables per block,
        # then append-write per partition (atomic via tmp + rename)
        def write_partition(group: "pa.Table") -> pa.Table:
            pid = group["__pid"][0].as_py()
            tbl = group.drop_columns(["__pid"])
            pdir = os.path.join(stage_dir, f"part-{pid}")
            tmp = pdir + ".tmp"
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(tbl, os.path.join(tmp, "data.parquet"))
            if os.path.isdir(pdir):
                shutil.rmtree(pdir)
            os.rename(tmp, pdir)
            with open(os.path.join(_lineage_dir(stage_dir), f"part-{pid}.json"), "w") as fh:
                json.dump({
                    "pid": pid, "input_digest": input_digest,
                    "written_at": time.time(), "metrics": _metrics(tbl),
                }, fh)
            return pa.table({"pid": pa.array([pid], pa.int64()),
                             "rows": pa.array([tbl.num_rows], pa.int64())})

        (
            todo.groupby("__pid")
            .map_groups(write_partition, batch_format="pyarrow")
            .materialize()
        )

        # zero-row partitions produce no group → no lineage file, which
        # would force a full upstream recompute on EVERY resume just to
        # rediscover they are empty. Write an empty parquet + lineage for
        # each still-missing pid so resume sees them as complete.
        still_missing = sorted(
            set(missing) - completed_partitions(stage_dir, input_digest)
        )
        if still_missing:
            schema = None
            for p in range(num_partitions):
                pdir = os.path.join(stage_dir, f"part-{p}")
                if os.path.isdir(pdir):
                    pf = [f for f in sorted(os.listdir(pdir)) if f.endswith(".parquet")]
                    if pf:
                        schema = pq.read_schema(os.path.join(pdir, pf[0]))
                        break
            if schema is None:  # the whole dataset was empty
                s = ds.schema()
                schema = pa.schema(list(zip(s.names, s.types)))
            empty = schema.empty_table()
            for pid in still_missing:
                pdir = os.path.join(stage_dir, f"part-{pid}")
                tmp = pdir + ".tmp"
                if os.path.isdir(tmp):
                    shutil.rmtree(tmp)
                os.makedirs(tmp, exist_ok=True)
                pq.write_table(empty, os.path.join(tmp, "data.parquet"))
                if os.path.isdir(pdir):
                    shutil.rmtree(pdir)
                os.rename(tmp, pdir)
                with open(os.path.join(_lineage_dir(stage_dir), f"part-{pid}.json"), "w") as fh:
                    json.dump({
                        "pid": pid, "input_digest": input_digest,
                        "written_at": time.time(), "metrics": _metrics(empty),
                    }, fh)

    files = []
    for p in range(num_partitions):
        pdir = os.path.join(stage_dir, f"part-{p}")
        if os.path.isdir(pdir):
            files.extend(
                os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                if f.endswith(".parquet")
            )
    if not files:  # read_parquet([]) raises; nothing was ever written
        return ray.data.from_arrow(pa.table({}))
    return ray.data.read_parquet(files)


def stage_digest(*parts: str) -> str:
    """Stable digest string for resume keys (input path + params)."""
    return f"{int(hash_strings(['|'.join(parts)])[0]):016x}"


def table_fingerprint(tbl: pa.Table) -> str:
    """Content hash of a driver-resident Arrow table (IPC stream bytes) —
    folds actual KB CONTENT into resume digests, not just its row count."""
    from ..functions.hashing import fnv1a_64

    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return f"{fnv1a_64(bytes(sink.getvalue())):016x}"


def dataset_input_token(ds: ray.data.Dataset) -> str:
    """Best-effort identity for a Dataset's source: its input file list
    (stable for read_* datasets). Empty for in-memory/derived datasets —
    callers should then pass an explicit input token."""
    try:
        files = ds.input_files() or []
    except Exception:
        files = []
    return f"{int(hash_strings(['|'.join(sorted(files))])[0]):016x}" if files else ""
