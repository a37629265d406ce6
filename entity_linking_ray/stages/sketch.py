"""Mergeable sketches for wide aggregates the full shuffle can't afford.

The reference computes its distincts and counts exactly (SURVEY.md §2.6
G5); at 100-TB scale an exact COUNT DISTINCT or global top-k over raw
tokens is an all-to-all shuffle of every distinct value. These operators
replace that with the standard mergeable-summary shapes (Agarwal et al.,
"Mergeable Summaries", PODS'12):

- :func:`hll_distinct` — HyperLogLog (Flajolet et al. 2007) approximate
  COUNT DISTINCT per group. Each batch reduces to one 2^p-byte register
  array per group it contains (vectorized: one ``np.maximum.at`` over
  splitmix64 hashes); registers merge by elementwise max — associative
  and idempotent, so the groupby shuffle moves ONLY fixed-size register
  blobs, never the values. Standard error ≈ 1.04/sqrt(2^p) (~1.6% at
  p=12); linear counting below the small-range threshold.
- :func:`heavy_hitter_words` — sketch-guided EXACT global top-k: a
  Misra-Gries pass (per-batch exact counts trimmed to the top ``width``
  with the (width+1)-th count subtracted — a valid MG summary; partials
  merged by counter addition then one global trim) yields a candidate
  set guaranteed to contain every token with true frequency >
  total/width; a second pass exactly recounts ONLY the candidates
  (broadcast via ``ray.put``, batch-local Arrow combiner) and the top-k
  of those counts is the exact global top-k whenever the k-th frequency
  clears the bound — asserted at runtime, so a too-narrow sketch fails
  loudly instead of silently returning wrong counts. The full-shuffle
  equivalent (``queries.py::word_freq_top20``) moves every distinct
  token; this moves ≤ width rows per batch plus the candidate recount.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import splitmix64


def _hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Register array (len 2^p, uint8) for one group's u64 hash values:
    register[h >> (64-p)] = max rank, rank = 1 + leading zeros of the
    remaining 64-p bits (capped at 64-p+1)."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if len(hashes) == 0:
        return regs
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = (hashes << np.uint64(p)).astype(np.uint64)
    # rank = clz(rest) + 1 over the (64-p)-bit suffix; rest==0 → max rank
    nz = rest != 0
    rank = np.full(len(hashes), 64 - p + 1, np.uint8)
    if nz.any():
        # clz via float64 exponent is unsafe near 2^53; use bit_length
        # through log2 on the uint64 viewed exactly: np.log2 of uint64
        # loses precision ≥2^53, so shift down to 32-bit halves instead
        r = rest[nz]
        hi = (r >> np.uint64(32)).astype(np.uint32)
        lo = (r & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        bl_hi = np.frexp(hi.astype(np.float64))[1]  # bit_length, exact <2^32
        bl_lo = np.frexp(lo.astype(np.float64))[1]
        bl = np.where(hi != 0, bl_hi + 32, bl_lo)
        rank[nz] = (64 - bl + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> int:
    """Raw HLL estimate with the standard small-range linear-counting
    correction (Flajolet et al. 2007)."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def hll_distinct(ds: ray.data.Dataset, *, key_col: str, val_col: str,
                 p: int = 12) -> ray.data.Dataset:
    """→ (key_col, approx_distinct: int64) — approximate COUNT(DISTINCT
    val) per key. Shuffle payload: one 2^p-byte register blob per
    (batch, key) partial; merge is elementwise max."""
    m = 1 << p

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": b[key_col].to_numpy(zero_copy_only=False),
            "v": b[val_col].to_numpy(zero_copy_only=False),
        })
        h = splitmix64(
            pd.util.hash_array(df["v"].to_numpy()).astype(np.uint64))
        keys_out, blobs = [], []
        order = np.argsort(df["k"].to_numpy(), kind="stable")
        ks = df["k"].to_numpy()[order]
        hs = h[order]
        bounds = np.nonzero(np.concatenate(
            ([True], ks[1:] != ks[:-1])))[0]
        ends = np.append(bounds[1:], len(ks))
        for s, e in zip(bounds, ends):
            keys_out.append(ks[s])
            blobs.append(_hll_registers(hs[s:e], p).tobytes())
        # arbitrary fan-in bucket: register max is associative,
        # commutative and idempotent, so any merge tree yields the exact
        # same final registers
        return pa.table({key_col: pa.array(keys_out),
                         "__regs": pa.array(blobs, pa.binary()),
                         "__f": pa.array(np.arange(len(keys_out),
                                                   dtype=np.int64) % 64)})

    def _max_regs(group: pd.DataFrame):
        g = group.sort_values(key_col, kind="mergesort")
        keys = g[key_col].to_numpy()
        out_k, out_r = [], []
        i = 0
        while i < len(g):
            j = i
            regs = np.zeros(m, np.uint8)
            while j < len(g) and keys[j] == keys[i]:
                regs = np.maximum(
                    regs, np.frombuffer(g["__regs"].iloc[j], np.uint8))
                j += 1
            out_k.append(keys[i])
            out_r.append(regs)
            i = j
        return out_k, out_r

    def merge_level1(group: pd.DataFrame) -> pd.DataFrame:
        out_k, out_r = _max_regs(group)
        return pd.DataFrame({key_col: out_k,
                             "__regs": [r.tobytes() for r in out_r]})

    def merge_final(group: pd.DataFrame) -> pd.DataFrame:
        out_k, out_r = _max_regs(group)
        return pd.DataFrame({key_col: out_k,
                             "approx_distinct": np.array(
                                 [_hll_estimate(r) for r in out_r],
                                 np.int64)})

    # TWO-LEVEL merge: a flat per-key merge receives one blob per
    # (batch, key) — unbounded fan-in at corpus scale; level 1 reduces
    # each (key, fan-in-bucket) slice to ONE blob, the final per-key
    # merge sees ≤ 64 blobs per key
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, "__f"])
            .map_groups(merge_level1, batch_format="pandas")
            .groupby(key_col).map_groups(merge_final,
                                         batch_format="pandas"))


def _mg_trim(words: np.ndarray, counts: np.ndarray,
             width: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Trim an exact (word, count) summary to a width-sized Misra-Gries
    summary: keep the top ``width`` counters and subtract the
    (width+1)-th count from each (the decrement-all step, batched).
    Returns (words, residual counts > 0, error_bound added)."""
    if len(words) <= width:
        return words, counts, 0
    order = np.argsort(-counts, kind="stable")
    cut = int(counts[order[width]])
    keep = order[:width]
    resid = counts[keep] - cut
    pos = resid > 0
    return words[keep][pos], resid[pos], cut


def heavy_hitter_words(ds: ray.data.Dataset, *, text_col: str = "text",
                       k: int = 10, width: int = 1024) -> ray.data.Dataset:
    """→ (word, n: int64) — EXACT global top-``k`` tokens by count,
    found with a Misra-Gries candidate pass + exact recount (module
    docstring). Tokenization matches ``word_freq_top20`` (single-space
    split). Raises if the sketch width cannot certify exactness —
    ``total/width`` must be below the k-th candidate count."""
    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(b[text_col], " "))
        t = (pa.table({"w": toks}).group_by("w")
             .aggregate([("w", "count")]).rename_columns(["w", "c"]))
        words = np.asarray(t["w"].to_pylist(), dtype=object)
        counts = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        w2, c2, err = _mg_trim(words, counts, width)
        # sentinel row (w = null) carries this batch's trim error exactly
        # once — the certification bound sums sentinels, no per-row
        # replication to deduplicate
        return pa.table({
            "w": pa.array(w2.tolist() + [None], pa.string()),
            "c": pa.array(np.append(c2, 0), pa.int64()),
            "__err": pa.array(np.append(np.zeros(len(w2), np.int64), err)),
        })

    # TWO-LEVEL merge tree (Agarwal et al.: MG summaries merge under any
    # tree, errors add): level 1 merges batch partials in 64 fan-in
    # groups, level 2 merges the ≤ 64 width-sized level-1 summaries.
    # A single flat merge would feed width × num_batches rows into ONE
    # task — unbounded at corpus scale; the tree caps every merge input
    # at max(64 × (width+1), num_batches/64 × (width+1)) rows, and
    # deeper corpora just add O(log) levels of the same shape.
    def _merge_counters(group: pd.DataFrame) -> tuple:
        err_in = int(group["__err"].sum())
        g = group[group["w"].notna()]
        agg = g.groupby("w", sort=False)["c"].sum().reset_index()
        words = agg["w"].to_numpy(dtype=object)
        counts = agg["c"].to_numpy(np.int64)
        w2, c2, err = _mg_trim(words, counts, width)
        return w2, c2, err_in + err

    def merge_level1(group: pd.DataFrame) -> pd.DataFrame:
        w2, c2, err_acc = _merge_counters(group)
        # same row shape as partial(): counters + one error sentinel
        return pd.DataFrame({
            "w": np.concatenate((w2, [None])),
            "c": np.append(c2, 0).astype(np.int64),
            "__err": np.append(np.zeros(len(w2), np.int64), err_acc),
        })

    def merge_final(group: pd.DataFrame) -> pd.DataFrame:
        w2, c2, bound = _merge_counters(group)
        # leading sentinel row (w = null) so the bound survives even when
        # every counter trims away (the uncertifiable-input case)
        return pd.DataFrame({"w": np.concatenate(([None], w2)),
                             "__bound": np.full(len(w2) + 1, bound,
                                                np.int64)})

    def fanin_key(b: pa.Table) -> pa.Table:
        # batch-constant bucket (content-derived, deterministic): all of
        # one batch's rows — counters AND its error sentinel — merge in
        # the same level-1 group, so each sentinel is counted exactly once
        g = int(b["c"].to_numpy(zero_copy_only=False).sum()
                + b.num_rows * 1009) % 64
        return b.append_column(
            "__g", pa.array(np.full(b.num_rows, g, np.int64)))

    def const_key(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__g2", pa.array(np.zeros(b.num_rows, np.int64)))

    cand = (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(fanin_key, batch_format="pyarrow")
            .groupby("__g").map_groups(merge_level1, batch_format="pandas")
            .map_batches(const_key, batch_format="pyarrow")
            .groupby("__g2").map_groups(merge_final, batch_format="pandas")
            .to_pandas())
    if not len(cand):  # empty corpus
        return ray.data.from_arrow(pa.table({
            "word": pa.array([], pa.string()),
            "n": pa.array([], pa.int64())}))
    bound = int(cand["__bound"].iloc[0])
    cand_words = cand["w"].dropna().tolist()
    if not cand_words:
        raise ValueError(
            f"heavy_hitter_words: sketch width {width} cannot certify "
            f"top-{k} (no counter survived; error bound {bound}); "
            f"increase width")
    cand_ref = ray.put(set(cand_words))

    # pass 2: exact recount of candidates only
    def recount(b: pa.Table) -> pa.Table:
        want = ray.get(cand_ref)
        toks = pc.list_flatten(pc.split_pattern(b[text_col], " "))
        t = (pa.table({"word": toks}).group_by("word")
             .aggregate([("word", "count")]).rename_columns(["word", "n"]))
        mask = pa.array([w in want for w in t["word"].to_pylist()])
        return t.filter(mask)

    from ray.data.aggregate import Sum

    exact = (ds.map_batches(recount, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("n", alias_name="n"))
             .sort(["n", "word"], descending=[True, False]))
    top = exact.limit(k).materialize()

    # certification: every NON-candidate word's true count <= bound
    # (sum of per-batch trim errors + the merged trim error — the
    # standard MG undercount guarantee), so the top-k over candidates is
    # the exact global top-k iff the k-th candidate count > bound
    kth = min(r["n"] for r in top.take_all()) if top.count() else 0
    if kth <= bound:
        raise ValueError(
            f"heavy_hitter_words: sketch width {width} cannot certify "
            f"top-{k} (k-th count {kth} <= error bound {bound}); "
            f"increase width")
    return top


def grouped_mode(ds: "ray.data.Dataset", *, key_col: str, val_col: str,
                 num_buckets: int = 64) -> "ray.data.Dataset":
    """→ (key, mode_val, n) — the per-key MODE (most frequent value,
    ties broken by the smallest value): SQL
    ``row_number() OVER (PARTITION BY key ORDER BY count(*) DESC, val)``
    = 1. The per-key companion of the global Misra-Gries top-k above,
    exact because the combiner keeps full (key, val) counts (the value
    domain per key is the cardinality bound — event-type-like columns,
    not free text).

    Scale shape: batch-local (key, val, count) Arrow combiner partials →
    one coarse key-bucket groupby whose kernel merges counts and takes
    the per-key argmax vectorized — the raw rows never shuffle."""
    import pandas as pd
    import pyarrow as pa

    def partial(b: pa.Table) -> pa.Table:
        t = (b.select([key_col, val_col])
             .group_by([key_col, val_col]).aggregate([([], "count_all")])
             .rename_columns([key_col, val_col, "__c"]))
        return t

    def argmax_bulk(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby([key_col, val_col], sort=False)["__c"].sum()
             .reset_index())
        # sort so the first row per key is (max count, min value)
        g = g.sort_values([key_col, "__c", val_col],
                          ascending=[True, False, True], kind="mergesort")
        top = g.drop_duplicates(subset=[key_col], keep="first")
        return pd.DataFrame({
            key_col: top[key_col].to_numpy(),
            "mode_val": top[val_col].to_numpy(),
            "n": top["__c"].to_numpy(np.int64),
        })

    from .windows import _add_key_bucket

    return (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(_add_key_bucket(key_col, num_buckets),
                         batch_format="pyarrow")
            .groupby("__kb").map_groups(argmax_bulk, batch_format="pandas"))


def _compact_weighted(vals: np.ndarray, wts: np.ndarray,
                      size: int) -> tuple[np.ndarray, np.ndarray]:
    """Re-compress a weighted value summary to ``size`` equi-weight
    points (value at weighted rank (j-0.5)/size · W, weight W/size each)
    — the classic mergeable quantile-summary compaction: each pass adds
    ≤ W/(2·size) rank error, so a two-level tree stays under ~1.5·N/size
    total. Deterministic (no RNG) like every sketch in this module."""
    order = np.argsort(vals, kind="mergesort")
    v, w = vals[order], wts[order]
    cw = np.cumsum(w)
    total = cw[-1]
    targets = total * (np.arange(size, dtype=np.float64) + 0.5) / size
    idx = np.minimum(np.searchsorted(cw, targets), len(v) - 1)
    return v[idx], np.full(size, total / size, np.float64)


def approx_quantiles(ds: "ray.data.Dataset", *, val_col: str,
                     qs: "tuple[float, ...]", sketch_size: int = 256,
                     fanin: int = 64) -> "ray.data.Dataset":
    """→ (q: float64, value: int64) — approximate quantiles of an int64
    column via a mergeable equi-weight summary sketch (the third classic
    sketch next to HLL and Misra-Gries: bounded-size, associative merge,
    rank error ~1.5·N/sketch_size over the two-level tree — the scale
    path when the exact range-partitioned quantile pass is too heavy or
    the input is a stream of partials).

    Shuffle payload: one (sketch_size × 16)-byte blob per input block;
    merge tree mirrors hll_distinct: fan-in buckets → one blob per
    bucket → final driver-small merge (≤ fanin rows ever co-locate)."""
    def partial(b: pa.Table) -> pa.Table:
        v = b[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) == 0:
            return pa.table({"__v": pa.array([], pa.binary()),
                             "__w": pa.array([], pa.binary()),
                             "__f": pa.array([], pa.int64())})
        size = min(sketch_size, len(v))
        pv, pw = _compact_weighted(v.astype(np.float64),
                                   np.ones(len(v), np.float64), size)
        # fan-in key from the first value's bits: deterministic, spreads
        # partials over the level-1 merge buckets
        f = int(np.uint64(np.float64(pv[0]).view(np.uint64))
                % np.uint64(fanin))
        return pa.table({"__v": pa.array([pv.tobytes()], pa.binary()),
                         "__w": pa.array([pw.tobytes()], pa.binary()),
                         "__f": pa.array([f], pa.int64())})

    def _merge_blobs(group: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        vs = np.concatenate([np.frombuffer(x, np.float64)
                             for x in group["__v"]])
        ws = np.concatenate([np.frombuffer(x, np.float64)
                             for x in group["__w"]])
        return _compact_weighted(vs, ws, sketch_size)

    def merge_level1(group: pd.DataFrame) -> pd.DataFrame:
        v, w = _merge_blobs(group)
        return pd.DataFrame({"__v": [v.tobytes()], "__w": [w.tobytes()],
                             "__g": np.zeros(1, np.int64)})

    def merge_final(group: pd.DataFrame) -> pd.DataFrame:
        vs = np.concatenate([np.frombuffer(x, np.float64)
                             for x in group["__v"]])
        ws = np.concatenate([np.frombuffer(x, np.float64)
                             for x in group["__w"]])
        order = np.argsort(vs, kind="mergesort")
        v, w = vs[order], ws[order]
        cw = np.cumsum(w)
        qarr = np.asarray(qs, np.float64)
        idx = np.minimum(np.searchsorted(cw, qarr * cw[-1]), len(v) - 1)
        return pd.DataFrame({"q": qarr,
                             "value": v[idx].astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    level1 = parts.groupby("__f").map_groups(merge_level1,
                                             batch_format="pandas")
    return level1.groupby("__g").map_groups(merge_final,
                                            batch_format="pandas")


def table_digest(ds: ray.data.Dataset, *, cols: "list[str]",
                 sep: str = "|") -> ray.data.Dataset:
    """→ ONE row (n_rows, digest) — an order- and partition-independent
    corpus checksum: Σ over rows of ``fnv1a64(col1|col2|…) & MASK63``,
    mod 2^63. The replication/CDC verification primitive: two sides
    (a snapshot and its restore, a primary and a replica, pre- and
    post-migration) compare one 8-byte value instead of shipping rows;
    addition is commutative, so ANY partitioning/ordering produces the
    identical digest.

    Shape: each batch canonicalizes rows with one Arrow
    ``binary_join_element_wise`` (casts + join, no Python per row),
    hashes zero-copy off the utf-8 buffer, and reduces to a single
    (lo, hi, n) limb row — 31-bit lo limbs keep the int64 batch sums
    exact up to 2^32 rows per batch (the 32-bit hi limbs to 2^31; both
    far above any real block). The per-block partials (one tiny row each)
    fold in one final task with uint64 wrap-around arithmetic, which
    preserves the value mod 2^63 exactly. The DuckDB oracle replicates
    the FNV byte loop (oracles.fnv1a_sql) and the limb algebra in
    HUGEINT."""
    from ..functions.hashing import hash_strings_arrow

    M31 = np.int64((1 << 31) - 1)

    def partial(b: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            col = b[c]
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            parts.append(col.combine_chunks()
                         if isinstance(col, pa.ChunkedArray) else col)
        joined = (pc.binary_join_element_wise(*parts, sep)
                  if len(parts) > 1 else parts[0])
        h = hash_strings_arrow(joined)  # fnv1a64 & MASK63 (seed 0)
        return pa.table({
            "__lo": pa.array([int((h & M31).sum())], pa.int64()),
            "__hi": pa.array([int((h >> 31).sum())], pa.int64()),
            "__n": pa.array([len(h)], pa.int64()),
        })

    def final(b: pa.Table) -> pa.Table:
        lo = b["__lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hi = b["__hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = int(b["__n"].to_numpy(zero_copy_only=False).sum())
        with np.errstate(over="ignore"):  # wrap mod 2^64 is the design
            total = (hi.sum() << np.uint64(31)) + lo.sum()
        digest = int(total & np.uint64(0x7FFFFFFFFFFFFFFF))
        return pa.table({"n_rows": pa.array([n], pa.int64()),
                         "digest": pa.array([digest], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow"))
