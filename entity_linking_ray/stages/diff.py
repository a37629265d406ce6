"""Snapshot reconciliation diff (CDC-style table compare).

The data-engineering op behind incremental corpus refreshes and backfill
audits: given two keyed snapshots of the same table (old and new crawl,
yesterday's and today's partition), emit one row per key whose state
changed — ``added`` (new only), ``removed`` (old only) or ``changed``
(both sides, value differs). SQL shape: FULL OUTER JOIN on the key with
a CASE over null-sides — which Ray Data has no native operator for; the
scale shape here is the repo's standard tag-union + coarse key-hash
bucket co-group:

1. each side is tagged (key, value, __side) — a SLIM projection, no
   payload columns ride the shuffle;
2. one deterministic splitmix bucket column partitions BOTH sides the
   same way (the only all-to-all, and it moves 2 columns + a tag);
3. per bucket, ONE vectorized pandas outer merge + status classification
   covers every key in the bucket.

Keys must be unique per side (snapshot semantics — the caller dedups
first if not); duplicate keys would cross-multiply in the merge, same
contract as any keyed upsert. Missing sides surface as a sentinel value
(default -1) rather than nulls so downstream hashing/joins stay typed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import splitmix64


def snapshot_diff(old: ray.data.Dataset, new: ray.data.Dataset, *,
                  key_col: str, val_col: str, num_buckets: int = 64,
                  missing: int = -1, include_unchanged: bool = False,
                  strict: bool = True) -> ray.data.Dataset:
    """→ (key_col, status: string, old_<val>, new_<val>) for every key
    whose presence or int64 value differs between the two snapshots.
    ``status`` ∈ {added, removed, changed} (+ unchanged when opted in).

    ``strict`` (default) raises if either side repeats a key — a repeated
    key would silently cross-multiply in the merge and misreport counts
    (the same fail-loudly contract as the ngram-Jaccard posting-list
    cap); pass ``strict=False`` only when the caller has already deduped.
    The check is per co-group bucket, so it costs one duplicated()
    scan over rows already co-located — no extra pass.
    """
    old_out, new_out = f"old_{val_col}", f"new_{val_col}"

    def tagger(side: int):
        def tag(b: pa.Table) -> pa.Table:
            key = pc.cast(b[key_col], pa.int64())
            kb = (splitmix64(key.to_numpy(zero_copy_only=False)
                             .astype(np.uint64))
                  % np.uint64(num_buckets)).astype(np.int64)
            return pa.table({
                key_col: key,
                "__v": pc.cast(b[val_col], pa.int64()),
                "__side": pa.array(np.full(len(b), side, np.int8)),
                "__kb": pa.array(kb),
            })
        return tag

    tagged = (old.map_batches(tagger(0), batch_format="pyarrow")
              .union(new.map_batches(tagger(1), batch_format="pyarrow")))

    def diff(group: pd.DataFrame) -> pd.DataFrame:
        # nullable Int64 (not float64+NaN) keeps values exact at every
        # int64 magnitude through the outer merge
        g = group.astype({"__v": "Int64"})
        a = g[g["__side"] == 0][[key_col, "__v"]]
        b = g[g["__side"] == 1][[key_col, "__v"]]
        if strict:
            for side, frame in (("old", a), ("new", b)):
                if frame[key_col].duplicated().any():
                    dup = frame[key_col][frame[key_col].duplicated()].iloc[0]
                    raise ValueError(
                        f"snapshot_diff: duplicate key {dup!r} on the "
                        f"{side} side — snapshots must be unique per key "
                        "(dedup upstream or pass strict=False)")
        m = a.merge(b, on=key_col, how="outer", suffixes=("_o", "_n"))
        o, n = m["__v_o"], m["__v_n"]
        only_n, only_o = o.isna().to_numpy(), n.isna().to_numpy()
        ov = o.fillna(missing).to_numpy(np.int64)
        nv = n.fillna(missing).to_numpy(np.int64)
        status = np.where(only_n, "added",
                          np.where(only_o, "removed",
                                   np.where(ov != nv, "changed",
                                            "unchanged")))
        out = pd.DataFrame({
            key_col: m[key_col].to_numpy(np.int64),
            "status": status,
            old_out: ov,
            new_out: nv,
        })
        if not include_unchanged:
            out = out[out["status"] != "unchanged"]
        return out

    return tagged.groupby("__kb").map_groups(diff, batch_format="pandas")
