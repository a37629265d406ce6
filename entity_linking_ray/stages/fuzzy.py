"""Blocked edit-distance similarity self-join — the classic ER "fuzzy
match within a blocking key" shape (the reference scores candidate pairs
with Levenshtein/Jaro-Winkler after exact-alias blocking —
``candidate_ranking``'s string features; SURVEY.md §2.8). This stage
generalizes that into a standalone operator: find all pairs of DISTINCT
values whose edit distance is within ``max_dist``, comparing only pairs
that share a blocking key.

Scale shape: the pair search runs over the DISTINCT value vocabulary,
not the row stream — a 100-TB corpus's name column has a vocabulary
orders of magnitude smaller than its row count, and the distinct pass is
a slim bucketed groupby. Within a block the verify is quadratic, so the
blocking key choice IS the cost model (documented contract: recall is
within-block only, exactly like every ER blocking scheme); a per-block
row cap fails loudly rather than letting one degenerate block go O(n²).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import hash_strings
from ..functions.strsim import levenshtein


def _block_last_token(s: str) -> str:
    parts = s.rsplit(None, 1)
    return parts[-1] if parts else ""


def _block_prefix(k: int):
    def f(s: str) -> str:
        return s[:k]
    return f


def fuzzy_value_pairs(ds: ray.data.Dataset, *, col: str,
                      max_dist: int = 2,
                      block: str = "last_token",
                      prefix_len: int = 4,
                      max_block_values: int = 10_000,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """→ (name_a, name_b, dist) over DISTINCT values of ``col`` with
    ``name_a < name_b``, Levenshtein(name_a, name_b) <= ``max_dist``,
    compared within blocks of equal ``block`` key (``"last_token"`` —
    the trailing whitespace token — or ``"prefix"`` of ``prefix_len``
    chars).

    Plan: batch-local distinct (Arrow group_by combiner) → bucketed
    groupby distinct over value hashes (only (value, block-hash) rows
    shuffle) → one pandas kernel per coarse bucket runs every block's
    pairwise verify with a length prefilter (|len(a)-len(b)| <= max_dist
    bounds the edit distance from below, so those pairs skip the DP).
    A block over ``max_block_values`` distinct values raises (quadratic
    guard — pick a more selective blocking key)."""
    if block == "last_token":
        blocker = _block_last_token
    elif block in ("soundex", "soundex_last_token"):
        # phonetic blocking family (functions/phonetic.py): misspelled
        # variants share a key, so the Levenshtein verify sees them even
        # when exact prefix/suffix blocking would split them. The
        # "_last_token" variant keys the trailing word only — the
        # phonetic widening of "last_token" (multi-word values keep
        # their most discriminative token while tolerating respellings)
        from ..functions.phonetic import soundex

        if block == "soundex":
            blocker = soundex
        else:
            def blocker(s: str) -> str:
                return soundex(_block_last_token(s))
    else:
        blocker = _block_prefix(prefix_len)

    def distinct_partial(b: pa.Table) -> pa.Table:
        part = b.select([col]).group_by([col]).aggregate([])
        vals = part[col].to_pylist()
        bh = hash_strings([blocker(v or "") for v in vals])
        return pa.table({
            col: part[col],
            "__bh": pa.array(bh, pa.int64()),
            "__cb": pa.array(bh % num_buckets, pa.int64()),
        })

    def _empty() -> pa.Table:
        return pa.table({"name_a": pa.array([], pa.string()),
                         "name_b": pa.array([], pa.string()),
                         "dist": pa.array([], pa.int64())})

    def pairs_bulk(group: pa.Table) -> pa.Table:
        # Arrow-native group; the per-pair levenshtein stays Python (it
        # is the verify itself), only the frame copy went away
        if col not in group.schema.names or not group.num_rows:
            return _empty()
        vals0 = np.asarray(group[col].to_pylist(), dtype=object)
        bh0 = group["__bh"].to_numpy(zero_copy_only=False)
        _, ui = np.unique(vals0, return_index=True)  # distinct values
        vals0, bh0 = vals0[ui], bh0[ui]
        o = np.lexsort((vals0, bh0))
        vals, bhs = vals0[o], bh0[o]
        starts = np.nonzero(np.concatenate(
            ([True], bhs[1:] != bhs[:-1])))[0]
        ends = np.append(starts[1:], len(vals))
        biggest = int((ends - starts).max())
        if biggest > max_block_values:
            raise ValueError(
                f"fuzzy_value_pairs: a block holds {biggest} "
                f"distinct values (> max_block_values={max_block_values}) "
                "— the quadratic verify would blow up; choose a more "
                "selective blocking key or raise the cap explicitly")
        lens = np.fromiter((len(v) for v in vals), np.int64, len(vals))
        out_a, out_b, out_d = [], [], []
        for s, e in zip(starts, ends):
            for i in range(s, e):
                for j in range(i + 1, e):
                    if abs(lens[i] - lens[j]) > max_dist:
                        continue
                    d = levenshtein(vals[i], vals[j])
                    if d <= max_dist:
                        out_a.append(vals[i])
                        out_b.append(vals[j])
                        out_d.append(d)
        return pa.table({"name_a": pa.array(out_a, pa.string()),
                         "name_b": pa.array(out_b, pa.string()),
                         "dist": pa.array(out_d, pa.int64())})

    return (ds.map_batches(distinct_partial, batch_format="pyarrow")
            .groupby("__cb").map_groups(pairs_bulk, batch_format="pyarrow"))
