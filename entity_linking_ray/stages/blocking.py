"""Blocking: primary key = normalized-surface-form hash; second family =
MinHash-LSH band keys over character shingles; explicit hot-key salting.

Reference analogue: the alias table IS the primary blocking structure
(J1, ``service_main.py:117-123``); the reference has no near-dup family
(D5 absent) and no skew handling (SURVEY.md §4 — hot aliases processed
serially). Both gaps are closed here per the north-star contract.

Salting contract: a block whose size exceeds ``cap`` is split into
``ceil(size/cap)`` salted sub-blocks (``block_key ⊕ salt``). Downstream
per-block work must either be associative (min/count — salt freely, then
re-aggregate on the unsalted key) or pair-generating (pairs are generated
within sub-blocks only, trading recall for a hard quadratic bound — the
standard blocking trade; per-block metrics record the truncation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import hash_strings, hash_strings_arrow, splitmix64
from ..functions.minhash import band_keys, signature_matrix


def add_block_key(batch: pa.Table, col: str = "norm_mention") -> pa.Table:
    """Primary blocking key: stable u64 hash of the normalized surface."""
    keys = hash_strings_arrow(batch[col])
    return batch.append_column("block_key", pa.array(keys, pa.int64()))


def lsh_band_rows(batch: pa.Table, col: str = "norm_mention",
                  num_perm: int = 32, num_bands: int = 8, shingle_k: int = 3,
                  key_cols: tuple = ("doc_id", "span_idx", "offset")) -> pa.Table:
    """Second blocking family: explode each row into ``num_bands`` rows of
    (key_cols..., band_key) — consumed by ``groupby("band_key")``."""
    strings = batch[col].to_pylist()
    sigs = signature_matrix(strings, num_perm=num_perm, k=shingle_k)
    bk = band_keys(sigs, num_bands=num_bands)  # [n, num_bands]
    n = len(strings)
    out = {c: np.repeat(np.asarray(batch[c].to_pylist(), dtype=object), num_bands) for c in key_cols}
    tbl = {c: pa.array(list(out[c])) for c in key_cols}
    tbl["band_key"] = pa.array(bk.reshape(-1), pa.int64())
    return pa.table(tbl)


def block_sizes(ds: ray.data.Dataset, key: str = "block_key") -> ray.data.Dataset:
    """Per-block mention counts (pre-aggregated per batch before the
    shuffle — the combiner pattern from SURVEY.md §4 skew row)."""

    from .agg import bucketed_agg

    # block-key cardinality scales with the corpus — bucketed count
    # (stages/agg.py; the per-batch combiner lives inside)
    return bucketed_agg(ds.select_columns([key]), key,
                        [(key, "count", "block_size")])


def hot_keys(ds: ray.data.Dataset, cap: int, key: str = "block_key") -> dict[int, int]:
    """Driver-side map block_key → num_salts for blocks over the cap.
    The result is tiny (only hot keys) and is broadcast via ``ray.put``."""
    hot: dict[int, int] = {}
    sizes = block_sizes(ds, key=key)
    for b in sizes.filter(expr=f"block_size > {cap}").iter_batches(batch_format="pyarrow"):
        for k, n in zip(b[key].to_pylist(), b["block_size"].to_pylist()):
            hot[int(k)] = int(np.ceil(n / cap))
    return hot


def add_salted_key(batch: pa.Table, hot: dict[int, int], key: str = "block_key",
                   row_hash_cols: tuple = ("doc_id", "offset")) -> pa.Table:
    """salted_key = block_key for cold blocks; block_key ⊕ mix(row_hash %
    num_salts) for hot ones. Deterministic per row (resume-safe)."""
    keys = np.asarray(batch[key].to_pylist(), dtype=np.int64)
    salts = np.zeros(len(keys), dtype=np.uint64)
    if hot:
        rh = hash_strings(
            [f"{a}:{b}" for a, b in zip(batch[row_hash_cols[0]].to_pylist(),
                                        batch[row_hash_cols[1]].to_pylist())]
        )
        for i, k in enumerate(keys):
            ns = hot.get(int(k))
            if ns:
                salts[i] = np.uint64(int(rh[i]) % ns + 1)
    mixed = splitmix64(keys.astype(np.uint64) ^ splitmix64(salts))
    mixed = (mixed & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    salted = np.where(salts > 0, mixed, keys)
    return batch.append_column("salted_key", pa.array(salted, pa.int64()))


def surface_order_keys(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """→ int64 63-bit order keys = big-endian first-8-byte UTF-8 prefix
    (zero-padded) >> 1 — the sorted-neighborhood sort key. Vectorized:
    one fixed-width scatter over the Arrow string buffer per chunk (the
    per-row ``int.from_bytes`` loop this replaces was the last Python
    row loop on the sn_edges hot path; equality property-tested against
    the scalar definition)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    outs = []
    for ch in chunks:
        if len(ch) == 0:
            continue
        b = ch.cast(pa.large_string())  # 64-bit offsets, utf-8 data buffer
        off = np.frombuffer(b.buffers()[1], np.int64)[
            b.offset:b.offset + len(b) + 1]
        dbuf = b.buffers()[2]
        data = (np.frombuffer(dbuf, np.uint8) if dbuf is not None
                else np.empty(0, np.uint8))
        starts = off[:-1]
        w = np.minimum(np.diff(off), 8)
        rows = np.repeat(np.arange(len(b), dtype=np.int64), w)
        pos = (np.arange(int(w.sum()), dtype=np.int64)
               - np.repeat(np.concatenate(
                   [[np.int64(0)], np.cumsum(w)[:-1]]), w))
        M = np.zeros((len(b), 8), np.uint8)
        M[rows, pos] = data[np.repeat(starts, w) + pos]
        u = M.view(">u8")[:, 0].astype(np.uint64)
        outs.append((u >> np.uint64(1)).astype(np.int64))
    return np.concatenate(outs) if outs else np.empty(0, np.int64)


def sorted_neighborhood_pairs(ds: "ray.data.Dataset", *, val_col: str,
                              id_col: str, window: int,
                              num_buckets: int = 64) -> "ray.data.Dataset":
    """→ (id_a, id_b, dist) — the third blocking family: classic
    sorted-neighborhood blocking (Hernández & Stolfo 1995): records are
    globally ordered by an int64 sort key (callers fixed-point-encode;
    ties by id) and every pair within ``window`` positions is a
    candidate. Complements the hash and LSH families: it catches near
    neighbors that straddle a hash-block boundary, with a hard O(n·w)
    candidate bound instead of a per-block quadratic.

    Scale shape: the global position comes from the range-partitioned
    rank (stages/scan.global_rank — equi-depth sketch buckets, no full
    sort); pair generation then needs only LOCAL order, so rows bucket
    by ``rank // span`` with the last ``window - 1`` ranks of each
    bucket REPLICATED into the next (the standard boundary-overlap
    trick) — every pair is generated exactly once, in the bucket where
    its RIGHT end is native (that bucket provably also holds the left
    end, native or replicated), so no dedup pass is needed."""
    if window < 2:
        raise ValueError("window must be >= 2")
    from .scan import global_rank

    ranked = global_rank(ds.select_columns([id_col, val_col]),
                         val_col=val_col, id_col=id_col, out_col="__r",
                         num_buckets=num_buckets).materialize()
    n = ranked.count()
    span = max(window, -(-n // max(1, num_buckets)))

    def route(b: pa.Table) -> pa.Table:
        r = b["__r"].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        home = (r - 1) // span
        # boundary replication: the last window-1 ranks of each span also
        # serve the next bucket's left edge
        tail = (r - 1) % span >= span - (window - 1)
        kb = np.concatenate([home, home[tail] + 1])
        rr = np.concatenate([r, r[tail]])
        ii = np.concatenate([ids, ids[tail]])
        return pa.table({"__kb": pa.array(kb.astype(np.int64)),
                         "__r": pa.array(rr), id_col: pa.array(ii)})

    def pairs(group: pa.Table) -> pa.Table:
        # Arrow-native: argsort off the buffers; the j-offset loop is
        # O(window) numpy passes either way (window is small by design)
        kb = int(group["__kb"][0].as_py())
        r0 = group["__r"].to_numpy(zero_copy_only=False)
        o = np.argsort(r0, kind="stable")
        r = r0[o].astype(np.int64)
        ids = group[id_col].to_numpy(zero_copy_only=False)[o].astype(np.int64)
        lo = kb * span + 1  # own pairs whose RIGHT end is native here
        out_a, out_b, out_d = [], [], []
        m = len(r)
        for j in range(1, window):
            a = np.arange(0, m - j)
            ok = (r[a + j] - r[a] <= window - 1) & (r[a + j] >= lo) \
                & (r[a + j] < lo + span)
            out_a.append(ids[a[ok]])
            out_b.append(ids[a[ok] + j])
            out_d.append(r[a[ok] + j] - r[a[ok]])
        z = np.array([], np.int64)
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a) if out_a else z),
            "id_b": pa.array(np.concatenate(out_b) if out_b else z),
            "dist": pa.array(np.concatenate(out_d) if out_d else z),
        })

    return (ranked.map_batches(route, batch_format="pyarrow")
            .groupby("__kb").map_groups(pairs, batch_format="pyarrow"))


def segment_pairs(keys: "np.ndarray") -> "tuple[np.ndarray, np.ndarray]":
    """→ (ai, bi) index pairs of every unordered within-segment
    combination of a KEY-SORTED array — the vectorized basket /
    pair-explosion kernel shared by the co-occurrence and itemset-
    support queries (no Python loop, never a cross-segment pair). Sort
    the rows by (key, value) first and ``vals[ai] < vals[bi]`` holds by
    construction for distinct values."""
    n = len(keys)
    new = np.ones(n, dtype=bool)
    if n > 1:
        new[1:] = keys[1:] != keys[:-1]
    starts = np.nonzero(new)[0]
    cnt = np.diff(np.append(starts, n))
    seg = np.cumsum(new) - 1
    pos = np.arange(n) - starts[seg]
    reps = cnt[seg] - pos - 1
    ai = np.repeat(np.arange(n), reps)
    off = (np.arange(reps.sum())
           - np.repeat(np.concatenate([[0], np.cumsum(reps)[:-1]]),
                       reps) + 1)
    return ai, ai + off
