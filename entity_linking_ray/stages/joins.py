"""Temporal joins Ray Data lacks natively: as-of and range joins.

Both are implemented as ONE co-group shuffle: the two sides are projected
onto a shared schema with a ``__side`` tag, unioned, grouped by the join
key, and matched inside each group with vectorized ``searchsorted`` over
the sorted right-side timestamps. By default a single key's rows land in
one group; for HOT keys (one user with the whole 100-TB stream's history)
``salt_bucket_us`` shards a key by time bucket.

Salting is ROUTED, not unconditional: with ``salt_bucket_us`` set, an
exact combiner word-count pass finds the keys whose total row count
reaches ``hot_key_rows``; only those route through the salted plan, and
everything else takes the plain one-shuffle co-group. Salting every key
multiplies the group count by the active-bucket count and pays 2 extra
phases per query — measured 2.9 s → 36.3 s on the sf0.1 as-of query when
the salted plan ran unconditionally. The hot set is at most
total_rows / hot_key_rows keys, so the broadcast is bounded by
construction. The per-key salted plans:

- as-of: per-(key, bucket) groups resolve in-bucket matches; lefts with
  no in-bucket predecessor fall back to a second, SUMMARY-sized co-group
  per key (one max-timestamp row per non-empty right bucket) that takes a
  prefix max over earlier buckets. Group size is bounded by the per-bucket
  row count plus the bucket count — never the key's full history.
- range: right rows replicate to every bucket their timestamp can serve
  (1 + ceil((before+after)/bucket) copies); each left row then counts
  entirely inside its own (key, bucket) group. Exact, one phase.
- sessions (stages/windows.py): pre-segment inside each (key, bucket),
  then merge boundary sessions per key over the session SUMMARIES.

- :func:`asof_join_latest` — for every left row, the latest right
  timestamp ≤ the left timestamp (backward as-of). Emitting the matched
  TIMESTAMP (not an arbitrary matched row id) keeps the result
  deterministic when several right rows share the boundary timestamp —
  the same semantics DuckDB's ``ASOF JOIN`` guarantees.
- :func:`range_join_count` — for every left row, how many right rows fall
  in ``[t - before, t + after]``: two searchsorted probes per group, no
  pair materialization (the safe formulation of a range join at scale —
  pair EXPLOSION is what makes naive range joins quadratic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_NO_MATCH = -1


def _tagged_union(left: ray.data.Dataset, right: ray.data.Dataset,
                  key: str, ts: str, left_id: str) -> ray.data.Dataset:
    def tag_left(b: pa.Table) -> pa.Table:
        return pa.table({
            key: b[key],
            "__t": pc.cast(b[ts], pa.int64()),
            "__id": pc.cast(b[left_id], pa.int64()),
            "__side": pa.array(np.zeros(b.num_rows, np.int8)),
        })

    def tag_right(b: pa.Table) -> pa.Table:
        return pa.table({
            key: b[key],
            "__t": pc.cast(b[ts], pa.int64()),
            "__id": pa.array(np.full(b.num_rows, _NO_MATCH, np.int64)),
            "__side": pa.array(np.ones(b.num_rows, np.int8)),
        })

    return left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))


def hot_keys(ds: ray.data.Dataset, key: str, hot_rows: int) -> list:
    """EXACT per-key row counts (batch-local Arrow group_by combiner → one
    small groupby-sum shuffle of partials), filtered to keys with >=
    ``hot_rows`` rows. Returns a driver-side python list — bounded by
    total_rows / hot_rows, so always broadcast-able."""
    from .agg import bucketed_agg

    agg = (bucketed_agg(ds.select_columns([key]), key,
                        [(key, "count", "__n")])
           .map_batches(lambda b: b.filter(
               pc.greater_equal(b["__n"], pa.scalar(hot_rows, pa.int64())))
               .select([key]), batch_format="pyarrow")
           .materialize())
    if agg.count() == 0:
        return []
    return agg.to_pandas()[key].tolist()


def _key_filter(ds: ray.data.Dataset, key: str, keys: list,
                keep: bool) -> ray.data.Dataset:
    value_set = pa.array(keys)

    def flt(b: pa.Table) -> pa.Table:
        m = pc.is_in(b[key], value_set=value_set)
        return b.filter(m if keep else pc.invert(m))

    return ds.map_batches(flt, batch_format="pyarrow")


def asof_join_latest(left: ray.data.Dataset, right: ray.data.Dataset, *,
                     key: str, ts: str, left_id: str,
                     out_col: str = "asof_t",
                     salt_bucket_us: int | None = None,
                     hot_key_rows: int = 200_000,
                     hot: list | None = None) -> ray.data.Dataset:
    """→ (left_id, key, t, out_col) with out_col = max right __t ≤ t per
    key, or -1 when no right row precedes the left row.

    With ``salt_bucket_us`` set, keys holding >= ``hot_key_rows`` rows
    (left+right, exact combiner count) route through the salted two-phase
    plan (module docstring); all other keys take the plain co-group.
    Identical output either way — routing is purely a skew guard.

    The slim tagged union is materialized ONCE when salting is on: the
    hot-key detection pass, the cold co-group, and the salted plan all
    read the materialized 4-column projection instead of re-executing
    the upstream — one upstream scan, not three. Callers sharing a key
    column across several salted operators can pass a precomputed
    ``hot`` list to skip detection entirely."""
    tagged = _tagged_union(left, right, key, ts, left_id)
    if salt_bucket_us is None:
        return _asof_match(tagged, key=key, left_id=left_id, out_col=out_col)
    tagged = tagged.materialize()
    if hot is None:
        hot = hot_keys(tagged, key, hot_key_rows)
    if not hot:
        return _asof_match(tagged, key=key, left_id=left_id, out_col=out_col)
    cold = _asof_match(_key_filter(tagged, key, hot, keep=False),
                       key=key, left_id=left_id, out_col=out_col)
    salted = _asof_salted_tagged(
        _key_filter(tagged, key, hot, keep=True),
        key=key, left_id=left_id, out_col=out_col,
        salt_bucket_us=salt_bucket_us)
    return cold.union(salted)


def _match_bulk(tagged: ray.data.Dataset, *, key: str, left_id: str,
                out_col: str, kernel) -> ray.data.Dataset:
    """Co-group matcher on a COARSE key-hash-bucket shuffle: one
    map_groups call covers many keys (one pandas call per key collapses
    when the key space is large — the same fix as the window family);
    inside a bucket, each key's sorted right timestamps feed
    ``kernel(rt, lt) -> int64`` with plain numpy searchsorted — no
    per-key pandas frames."""
    def add_kb(b: pa.Table) -> pa.Table:
        kb = pd.util.hash_array(
            b[key].to_numpy(zero_copy_only=False)) % 64
        return b.append_column("__kb", pa.array(kb.astype(np.int64),
                                                pa.int64()))

    def match(group: pa.Table) -> pa.Table:
        # Arrow-native co-group: numpy kernel straight off the Arrow
        # buffers, output columns gathered by take (key keeps its type) —
        # no per-group pandas frame (round-5 VERDICT #4)
        keys_np = group[key].to_numpy(zero_copy_only=False)
        ts_ = group["__t"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, inv = np.unique(keys_np, return_inverse=True)
        order = np.lexsort((ts_, inv))
        inv_s, ts_s = inv[order], ts_[order]
        sides = group["__side"].to_numpy(zero_copy_only=False)[order]
        n = len(order)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = inv_s[1:] != inv_s[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], n)
        out_pos, out_v = [], []
        for s, e in zip(starts, ends):
            lmask = sides[s:e] == 0
            lt = ts_s[s:e][lmask]
            if not len(lt):
                continue
            rt = ts_s[s:e][~lmask]  # time-sorted within the key
            out_pos.append(order[s:e][lmask])
            out_v.append(kernel(rt, lt))
        if not out_pos:
            return pa.table({
                left_id: pa.array([], pa.int64()),
                key: group[key].slice(0, 0),
                "t": pa.array([], pa.int64()),
                out_col: pa.array([], pa.int64())})
        take = pa.array(np.concatenate(out_pos), pa.int64())
        return pa.table({
            left_id: pc.cast(group["__id"].take(take), pa.int64()),
            key: group[key].take(take),
            "t": pa.array(ts_[np.concatenate(out_pos)], pa.int64()),
            out_col: pa.array(np.concatenate(out_v).astype(np.int64),
                              pa.int64())})

    return (tagged.map_batches(add_kb, batch_format="pyarrow")
            .groupby("__kb").map_groups(match, batch_format="pyarrow"))


def _asof_match(tagged: ray.data.Dataset, *, key: str, left_id: str,
                out_col: str) -> ray.data.Dataset:
    def asof(rt: np.ndarray, lt: np.ndarray) -> np.ndarray:
        if not len(rt):
            return np.full(len(lt), _NO_MATCH, np.int64)
        pos = np.searchsorted(rt, lt, side="right") - 1
        return np.where(pos >= 0, rt[np.clip(pos, 0, None)], _NO_MATCH)

    return _match_bulk(tagged, key=key, left_id=left_id, out_col=out_col,
                       kernel=asof)


def range_join_count(left: ray.data.Dataset, right: ray.data.Dataset, *,
                     key: str, ts: str, left_id: str,
                     before_us: int, after_us: int,
                     out_col: str = "n_in_range",
                     salt_bucket_us: int | None = None,
                     hot_key_rows: int = 200_000,
                     hot: list | None = None) -> ray.data.Dataset:
    """→ (left_id, key, t, out_col) with out_col = |{right rows with
    __t in [t - before_us, t + after_us]}| per key.

    With ``salt_bucket_us`` set, keys holding >= ``hot_key_rows`` rows
    route through the salted single-phase plan (module docstring: right
    rows replicate to the buckets they can serve, each left counts inside
    its own (key, bucket) group); all other keys take the plain co-group.
    Identical output either way. As in :func:`asof_join_latest`, the slim
    tagged union materializes once so detection + cold + salted all read
    it (one upstream scan); pass a precomputed ``hot`` list to skip
    detection."""
    tagged = _tagged_union(left, right, key, ts, left_id)
    if salt_bucket_us is None:
        return _range_match(tagged, key=key, left_id=left_id,
                            before_us=before_us, after_us=after_us,
                            out_col=out_col)
    tagged = tagged.materialize()
    if hot is None:
        hot = hot_keys(tagged, key, hot_key_rows)
    if not hot:
        return _range_match(tagged, key=key, left_id=left_id,
                            before_us=before_us, after_us=after_us,
                            out_col=out_col)
    cold = _range_match(_key_filter(tagged, key, hot, keep=False),
                        key=key, left_id=left_id, before_us=before_us,
                        after_us=after_us, out_col=out_col)
    salted = _range_salted_tagged(
        _key_filter(tagged, key, hot, keep=True),
        key=key, left_id=left_id, before_us=before_us,
        after_us=after_us, out_col=out_col, salt_bucket_us=salt_bucket_us)
    return cold.union(salted)


def _range_match(tagged: ray.data.Dataset, *, key: str, left_id: str,
                 before_us: int, after_us: int,
                 out_col: str) -> ray.data.Dataset:
    def in_range(rt: np.ndarray, lt: np.ndarray) -> np.ndarray:
        lo = np.searchsorted(rt, lt - before_us, side="left")
        hi = np.searchsorted(rt, lt + after_us, side="right")
        return (hi - lo).astype(np.int64)

    return _match_bulk(tagged, key=key, left_id=left_id, out_col=out_col,
                       kernel=in_range)


def _add_bucket(tagged: ray.data.Dataset, width_us: int) -> ray.data.Dataset:
    def bucketize(b: pa.Table) -> pa.Table:
        t = b["__t"].to_numpy(zero_copy_only=False)
        return b.append_column("__bucket", pa.array(t // width_us, pa.int64()))

    return tagged.map_batches(bucketize, batch_format="pyarrow")


def _asof_salted_tagged(tagged_rows: ray.data.Dataset, *,
                        key: str, left_id: str, out_col: str,
                        salt_bucket_us: int) -> ray.data.Dataset:
    """Two-phase salted as-of (module docstring) over ALREADY-TAGGED rows
    (key, __t, __id, __side): phase A resolves lefts with an in-bucket
    predecessor inside (key, time-bucket) groups and emits one
    max-timestamp SUMMARY row per non-empty right bucket; phase B
    co-groups only the unresolved lefts with the summaries per key and
    takes a prefix max over strictly earlier buckets. Output is identical
    to the unsalted plan (property-tested on a skewed fixture)."""
    W = salt_bucket_us
    tagged = _add_bucket(tagged_rows, W)

    def match_a(group: pa.Table) -> pa.Table:
        # Arrow-native (VERDICT #4): masks + takes on the Arrow columns,
        # one typed output table — no per-group pandas frames
        side = group["__side"].to_numpy(zero_copy_only=False)
        t_all = group["__t"].to_numpy(zero_copy_only=False).astype(np.int64)
        l_idx = np.nonzero(side == 0)[0]
        rt = np.sort(t_all[side != 0])
        parts = []
        if len(l_idx):
            lt = t_all[l_idx]
            if len(rt):
                pos = np.searchsorted(rt, lt, side="right") - 1
                matched = np.where(pos >= 0, rt[np.clip(pos, 0, None)],
                                   _NO_MATCH)
            else:
                matched = np.full(len(lt), _NO_MATCH, np.int64)
            kind = np.where(matched == _NO_MATCH, 1, 0).astype(np.int8)
            take = pa.array(l_idx, pa.int64())
            parts.append(pa.table({
                left_id: pc.cast(group["__id"].take(take), pa.int64()),
                key: group[key].take(take),
                "t": pa.array(lt, pa.int64()),
                out_col: pa.array(matched, pa.int64()),
                "__kind": pa.array(kind, pa.int8())}))
        if len(rt):
            # summary row: t carries the BUCKET index, out_col the bucket max
            parts.append(pa.table({
                left_id: pa.array([_NO_MATCH], pa.int64()),
                key: group[key].slice(0, 1),
                "t": pa.array(
                    [int(group["__bucket"][0].as_py())], pa.int64()),
                out_col: pa.array([int(rt[-1])], pa.int64()),
                "__kind": pa.array([2], pa.int8())}))
        if not parts:
            return pa.table({
                left_id: pa.array([], pa.int64()),
                key: group[key].slice(0, 0),
                "t": pa.array([], pa.int64()),
                out_col: pa.array([], pa.int64()),
                "__kind": pa.array([], pa.int8())})
        return pa.concat_tables(parts)

    phase_a = tagged.groupby([key, "__bucket"]).map_groups(
        match_a, batch_format="pyarrow")

    resolved = phase_a.filter(expr="__kind == 0").drop_columns(["__kind"])

    def finish(group: pa.Table) -> pa.Table:
        kind = group["__kind"].to_numpy(zero_copy_only=False)
        t_all = group["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        un_idx = np.nonzero(kind == 1)[0]
        if not len(un_idx):
            return pa.table({
                left_id: pa.array([], pa.int64()),
                key: group[key].slice(0, 0),
                "t": pa.array([], pa.int64()),
                out_col: pa.array([], pa.int64())})
        s_idx = kind == 2
        sb = t_all[s_idx]                  # bucket indices
        smax = group[out_col].to_numpy(
            zero_copy_only=False).astype(np.int64)[s_idx]
        order = np.argsort(sb)
        sb = sb[order]
        smax = np.maximum.accumulate(smax[order])
        ub = t_all[un_idx] // W
        if len(sb):
            pos = np.searchsorted(sb, ub, side="left") - 1  # buckets < ub
            val = np.where(pos >= 0, smax[np.clip(pos, 0, None)], _NO_MATCH)
        else:
            val = np.full(len(un_idx), _NO_MATCH, np.int64)
        take = pa.array(un_idx, pa.int64())
        return pa.table({
            left_id: pc.cast(group[left_id].take(take), pa.int64()),
            key: group[key].take(take),
            "t": pa.array(t_all[un_idx], pa.int64()),
            out_col: pa.array(val, pa.int64())})

    fallback = phase_a.filter(expr="__kind > 0").groupby(key).map_groups(
        finish, batch_format="pyarrow")
    return resolved.union(fallback)


def _range_salted_tagged(tagged_rows: ray.data.Dataset, *,
                         key: str, left_id: str,
                         before_us: int, after_us: int, out_col: str,
                         salt_bucket_us: int) -> ray.data.Dataset:
    """Single-phase salted range count (module docstring) over
    ALREADY-TAGGED rows (key, __t, __id, __side): each right row
    replicates to every time bucket whose lefts it can serve; each left
    row counts inside its own (key, bucket) group. Exact — a qualifying
    right appears exactly once in the left's group."""
    W = salt_bucket_us

    def retag(b: pa.Table) -> pa.Table:
        t = b["__t"].to_numpy(zero_copy_only=False)
        side = b["__side"].to_numpy(zero_copy_only=False)
        is_l = side == 0
        # lefts land in their own bucket; rights replicate across every
        # bucket that can hold a left within [t-before, t+after]
        lob = np.where(is_l, t // W, (t - after_us) // W)
        hib = np.where(is_l, t // W, (t + before_us) // W)
        reps = (hib - lob + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), reps)
        within = np.arange(reps.sum(), dtype=np.int64) - \
            np.repeat(np.cumsum(reps) - reps, reps)
        take = pa.array(idx, pa.int64())
        return pa.table({
            key: b[key].take(take),
            "__t": pa.array(t[idx], pa.int64()),
            "__id": b["__id"].take(take),
            "__side": b["__side"].take(take),
            "__bucket": pa.array(lob[idx] + within, pa.int64()),
        })

    tagged = tagged_rows.map_batches(retag, batch_format="pyarrow")

    def match(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        l_idx = np.nonzero(side == 0)[0]
        if not len(l_idx):
            return pa.table({
                left_id: pa.array([], pa.int64()),
                key: group[key].slice(0, 0),
                "t": pa.array([], pa.int64()),
                out_col: pa.array([], pa.int64())})
        t_all = group["__t"].to_numpy(zero_copy_only=False).astype(np.int64)
        rt = np.sort(t_all[side != 0])
        lt = t_all[l_idx]
        lo = np.searchsorted(rt, lt - before_us, side="left")
        hi = np.searchsorted(rt, lt + after_us, side="right")
        take = pa.array(l_idx, pa.int64())
        return pa.table({
            left_id: pc.cast(group["__id"].take(take), pa.int64()),
            key: group[key].take(take),
            "t": pa.array(lt, pa.int64()),
            out_col: pa.array((hi - lo).astype(np.int64), pa.int64())})

    return tagged.groupby([key, "__bucket"]).map_groups(
        match, batch_format="pyarrow")


def _bloom_split(left: ray.data.Dataset, right: ray.data.Dataset,
                 on: tuple, right_on: tuple,
                 bloom_bits: int) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(maybe_present, definitely_absent) split of ``left`` by a Bloom
    filter over the right keys. The filter builds as a per-batch
    combiner (one fixed-size word-array partial per batch, OR-merged on
    the driver — bounded by num_batches × n_bits/8 bytes, independent of
    row count) and broadcasts once via ``ray.put``. Only the
    maybe-present rows — right-key matches plus the bounded
    false-positive residue — need the join shuffle; the definitely-absent
    rows never leave their block."""
    import pandas as pd

    from ..functions.bloom import bloom_build, bloom_might_contain

    def key_hash(b: pa.Table, cols: tuple) -> np.ndarray:
        h = pd.util.hash_array(
            b[cols[0]].to_numpy(zero_copy_only=False)).astype(np.uint64)
        for c in cols[1:]:
            h = h * np.uint64(0x100000001B3) ^ pd.util.hash_array(
                b[c].to_numpy(zero_copy_only=False)).astype(np.uint64)
        return h

    def partial(b: pa.Table) -> pa.Table:
        words = bloom_build(key_hash(b, right_on), n_bits=bloom_bits)
        # fan-in bucket from the blob content (deterministic; OR is
        # associative/commutative/idempotent, so any merge tree gives
        # the identical filter)
        f = int(words[:8].sum() % np.uint64(64))
        return pa.table({"__bloom": pa.array([words.tobytes()], pa.binary()),
                         "__f": pa.array([f], pa.int64())})

    def or_merge(group: pd.DataFrame) -> pd.DataFrame:
        words = np.zeros(bloom_bits // 64, np.uint64)
        for blob in group["__bloom"]:
            words |= np.frombuffer(blob, np.uint64)
        return pd.DataFrame({"__bloom": [words.tobytes()]})

    # tree-OR the per-batch blobs: collecting one n_bits/8 blob per batch
    # on the driver is unbounded in batch count; after the 64-way merge
    # the driver sees <= 64 fixed-size blobs
    blobs = (right.map_batches(partial, batch_format="pyarrow")
             .groupby("__f").map_groups(or_merge, batch_format="pandas")
             .to_pandas())
    words = np.zeros(bloom_bits // 64, np.uint64)
    for blob in blobs["__bloom"]:
        words |= np.frombuffer(blob, np.uint64)
    bloom_ref = ray.put(words)

    def split(keep_positive: bool):
        def flt(b: pa.Table) -> pa.Table:
            mask = bloom_might_contain(ray.get(bloom_ref), key_hash(b, on))
            return b.filter(pa.array(mask if keep_positive else ~mask))
        return flt

    return (left.map_batches(split(True), batch_format="pyarrow"),
            left.map_batches(split(False), batch_format="pyarrow"))


def _existence_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                    on: tuple, right_on: tuple | None,
                    num_partitions: int, keep_matches: bool,
                    bloom_bits: int | None = None) -> ray.data.Dataset:
    """Shared plan for semi/anti joins: the probe side reduces to ONE
    marker row per distinct key (batch-local Arrow distinct combiner →
    one small key-row groupby) before the hash join, so duplicate right
    keys can never multiply left rows and only key rows ride the
    shuffle — never the right table's payload.

    With ``bloom_bits`` set, a Bloom filter over the right keys splits
    the left side first: definitely-absent rows SKIP the join shuffle
    entirely (kept directly for anti, dropped for semi); only the
    maybe-present residue joins. False positives just take the exact
    path — the result is identical either way (property-tested)."""
    right_on = tuple(right_on or on)
    on = tuple(on)
    if bloom_bits is not None:
        maybe, absent = _bloom_split(left, right, on, right_on, bloom_bits)
        # the residue is small by design (matches + false positives) —
        # materialize it so the empty case short-circuits: an all-empty
        # join side crashes Ray 2.49's hash join (untyped empty blocks)
        maybe = maybe.materialize()
        if maybe.count() == 0:
            if not keep_matches:
                return absent
            # typed-empty result with the left schema
            return absent.map_batches(lambda b: b.slice(0, 0),
                                      batch_format="pyarrow")
        # an aggressive bloom filter leaves MOSTLY-empty blocks (one per
        # input block), and a join partition fed only empties hits the
        # same Ray 2.49 failure — rebuild the residue's blocks from its
        # real rows before the join
        exact = _existence_join(maybe.repartition(num_partitions),
                                right, on=on, right_on=right_on,
                                num_partitions=num_partitions,
                                keep_matches=keep_matches)
        return exact if keep_matches else exact.union(absent)

    from .agg import bucketed_agg

    def keys_only(b: pa.Table) -> pa.Table:
        return b.select(list(right_on))

    def add_hit(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__hit", pa.array(np.ones(b.num_rows, np.int8)))

    # bucketed distinct on the (data-scale) key set — Ray's native
    # per-key aggregate costs seconds at 100k keys (stages/agg.py)
    probe = (bucketed_agg(right.map_batches(keys_only,
                                            batch_format="pyarrow"),
                          list(right_on))
             .map_batches(add_hit, batch_format="pyarrow")
             .repartition(num_partitions))  # scrub untyped empty blocks
    joined = left.join(probe, "left_outer", num_partitions,
                       on=on, right_on=right_on)
    pred = pc.is_valid if keep_matches else pc.is_null
    extra = ["__hit"] + [c for c in right_on if c not in on]

    def flt(b: pa.Table) -> pa.Table:
        drop = [c for c in extra if c in b.column_names]
        return b.filter(pred(b["__hit"])).drop_columns(drop)

    return joined.map_batches(flt, batch_format="pyarrow")


def drop_empty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Rebuild a MATERIALIZED dataset without its zero-row blocks — by
    block METADATA only (no fetch, no shuffle; the refs are reused).

    Ray 2.49's hash join and sort-based groupby emit ZERO-COLUMN empty
    blocks for empty partitions; a later hash-join partition fed only
    those fails with "No match for FieldRef" (verify-skill gotcha), and
    map_batches cannot scrub them because UDFs skip empty blocks. The
    previous mitigation — ``.repartition(n)`` — pays a full extra
    all-to-all of real rows; this is the free version for datasets that
    are materialized anyway. Falls back to the input UNCHANGED when
    every block is empty — zero-column blocks carry no schema to
    rebuild from, so a caller that feeds the result into a join must
    short-circuit the count()==0 case itself (see
    ``dedup.dedup_new_against_corpus``)."""
    refs = []
    dropped = False
    for rb in ds.iter_internal_ref_bundles():
        for blk, meta in rb.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(blk)
            else:
                dropped = True
    if not refs or not dropped:
        return ds
    return ray.data.from_arrow_refs(refs)


def anti_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              on: tuple, right_on: tuple | None = None,
              num_partitions: int = 16,
              bloom_bits: int | None = None) -> ray.data.Dataset:
    """Left rows with NO key match in ``right`` (SQL NOT EXISTS) — the
    generic form of the loser-removal join inside
    ``stages/dedup.py::_drop_losers_keyed``. ``bloom_bits`` enables the
    Bloom prefilter: rows the filter rules out bypass the join shuffle
    and are kept directly (most of a 100-TB left side when matches are
    rare)."""
    return _existence_join(left, right, on=on, right_on=right_on,
                           num_partitions=num_partitions,
                           keep_matches=False, bloom_bits=bloom_bits)


def semi_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              on: tuple, right_on: tuple | None = None,
              num_partitions: int = 16,
              bloom_bits: int | None = None) -> ray.data.Dataset:
    """Left rows WITH at least one key match in ``right`` (SQL EXISTS);
    left rows are never duplicated, whatever the right-side key
    multiplicity. ``bloom_bits`` enables the Bloom prefilter: rows the
    filter rules out are dropped before the join shuffle."""
    return _existence_join(left, right, on=on, right_on=right_on,
                           num_partitions=num_partitions,
                           keep_matches=True, bloom_bits=bloom_bits)


def asof_join_value(left: ray.data.Dataset, right: ray.data.Dataset, *,
                    key: str, ts: str, left_id: str, right_id: str,
                    right_val: str, out_col: str = "asof_val",
                    default: int = _NO_MATCH) -> ray.data.Dataset:
    """→ (left_id, key, t, out_col) — backward as-of join that emits the
    right-side VALUE: for every left row, ``right_val`` of the latest
    right row with __t ≤ t under the deterministic total order
    (t, right_id); ``default`` when no right row precedes. Values ride
    as int64 (callers fixed-point-encode floats — the repo's oracle
    convention). Same coarse key-hash-bucket co-group as
    :func:`_match_bulk`; one shuffle, searchsorted matching."""
    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            key: b[key],
            "__t": pc.cast(b[ts], pa.int64()),
            "__id": pc.cast(b[left_id], pa.int64()),
            "__rid": pa.array(np.full(n, -1, np.int64)),
            "__v": pa.array(np.full(n, default, np.int64)),
            "__side": pa.array(np.zeros(n, np.int8)),
        })

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            key: b[key],
            "__t": pc.cast(b[ts], pa.int64()),
            "__id": pa.array(np.full(n, _NO_MATCH, np.int64)),
            "__rid": pc.cast(b[right_id], pa.int64()),
            "__v": pc.cast(b[right_val], pa.int64()),
            "__side": pa.array(np.ones(n, np.int8)),
        })

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def add_kb(b: pa.Table) -> pa.Table:
        kb = pd.util.hash_array(
            b[key].to_numpy(zero_copy_only=False)) % 64
        return b.append_column("__kb", pa.array(kb.astype(np.int64),
                                                pa.int64()))

    def match(group: pa.Table) -> pa.Table:
        # Arrow-native AND loop-free (the pandas version walked key
        # segments in Python): factorize the key, lexsort the right
        # rows by (key, t, rid), then ONE searchsorted of every left
        # probe (key, t, +inf) into the i8,i8,i8 structured view —
        # pos−1 is the max-(t, rid) at-or-before row, validated by a
        # same-key check. Keys gathered back zero-copy via take.
        keys_np = group[key].to_numpy(zero_copy_only=False)
        sides = group["__side"].to_numpy(zero_copy_only=False)
        ts_ = group["__t"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, inv = np.unique(keys_np, return_inverse=True)
        inv = inv.astype(np.int64)
        lmask = sides == 0
        lt = ts_[lmask]
        if not len(lt):
            return pa.table({left_id: pa.array([], pa.int64()),
                             key: group[key].slice(0, 0),
                             "t": pa.array([], pa.int64()),
                             out_col: pa.array([], pa.int64())})
        ids = group["__id"].to_numpy(
            zero_copy_only=False).astype(np.int64)[lmask]
        linv = inv[lmask]
        rinv, rt = inv[~lmask], ts_[~lmask]
        rrid = group["__rid"].to_numpy(
            zero_copy_only=False).astype(np.int64)[~lmask]
        rv = group["__v"].to_numpy(
            zero_copy_only=False).astype(np.int64)[~lmask]
        v = np.full(len(lt), default, np.int64)
        if len(rt):
            o = np.lexsort((rrid, rt, rinv))
            rinv_s, rt_s, rv_s = rinv[o], rt[o], rv[o]
            ev = np.ascontiguousarray(np.column_stack(
                [rinv_s, rt_s, rrid[o]])).view("i8,i8,i8").ravel()
            pv = np.ascontiguousarray(np.column_stack(
                [linv, lt, np.full(len(lt), np.iinfo(np.int64).max)])
            ).view("i8,i8,i8").ravel()
            pos = np.searchsorted(ev, pv, side="left") - 1
            posc = np.clip(pos, 0, None)
            ok = (pos >= 0) & (rinv_s[posc] == linv)
            v = np.where(ok, rv_s[posc], default)
        lidx = pa.array(np.nonzero(lmask)[0], pa.int64())
        return pa.table({left_id: pa.array(ids),
                         key: group[key].take(lidx),
                         "t": pa.array(lt),
                         out_col: pa.array(v.astype(np.int64))})

    return (tagged.map_batches(add_kb, batch_format="pyarrow")
            .groupby("__kb").map_groups(match, batch_format="pyarrow"))


def range_join_sum(left: ray.data.Dataset, right: ray.data.Dataset, *,
                   key: str, ts: str, left_id: str, right_val: str,
                   before_us: int, after_us: int,
                   out_col: str = "sum_in_range",
                   n_col: str = "n_in_range") -> ray.data.Dataset:
    """→ (left_id, key, t, out_col, n_col) — for every left row, the SUM
    of ``right_val`` (int64; callers fixed-point-encode) plus the count
    over right rows with __t in [t - before_us, t + after_us] per key.
    Completes :func:`range_join_count` into the windowed-aggregate form
    — still two searchsorted probes against a per-key cumsum, never a
    pair explosion. Same coarse key-hash-bucket co-group."""
    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            key: b[key],
            "__t": pc.cast(b[ts], pa.int64()),
            "__id": pc.cast(b[left_id], pa.int64()),
            "__v": pa.array(np.zeros(n, np.int64)),
            "__side": pa.array(np.zeros(n, np.int8)),
        })

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            key: b[key],
            "__t": pc.cast(b[ts], pa.int64()),
            "__id": pa.array(np.full(n, _NO_MATCH, np.int64)),
            "__v": pc.cast(b[right_val], pa.int64()),
            "__side": pa.array(np.ones(n, np.int8)),
        })

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def add_kb(b: pa.Table) -> pa.Table:
        kb = pd.util.hash_array(
            b[key].to_numpy(zero_copy_only=False)) % 64
        return b.append_column("__kb", pa.array(kb.astype(np.int64),
                                                pa.int64()))

    def match(group: pa.Table) -> pa.Table:
        # Arrow-native AND loop-free: right rows lexsorted by (key, t),
        # one GLOBAL cumsum over the sorted values, and the window
        # bounds from two structured-view searchsorteds of (key, t−b) /
        # (key, t+a) — per-key windows fall out because the composite
        # keys of other keys sort strictly outside [(k,·)]; an empty key
        # segment yields lo == hi → 0 sum, 0 count.
        keys_np = group[key].to_numpy(zero_copy_only=False)
        sides = group["__side"].to_numpy(zero_copy_only=False)
        ts_ = group["__t"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, inv = np.unique(keys_np, return_inverse=True)
        inv = inv.astype(np.int64)
        lmask = sides == 0
        lt = ts_[lmask]
        if not len(lt):
            z = pa.array([], pa.int64())
            return pa.table({left_id: z, key: group[key].slice(0, 0),
                             "t": z, out_col: z, n_col: z})
        ids = group["__id"].to_numpy(
            zero_copy_only=False).astype(np.int64)[lmask]
        linv = inv[lmask]
        rinv, rt = inv[~lmask], ts_[~lmask]
        rv = group["__v"].to_numpy(
            zero_copy_only=False).astype(np.int64)[~lmask]
        if len(rt):
            o = np.lexsort((rt, rinv))
            ev = np.ascontiguousarray(np.column_stack(
                [rinv[o], rt[o]])).view("i8,i8").ravel()
            csum = np.concatenate(([0], np.cumsum(rv[o])))
            lo = np.searchsorted(ev, np.ascontiguousarray(np.column_stack(
                [linv, lt - before_us])).view("i8,i8").ravel(), side="left")
            hi = np.searchsorted(ev, np.ascontiguousarray(np.column_stack(
                [linv, lt + after_us])).view("i8,i8").ravel(), side="right")
            sums = (csum[hi] - csum[lo]).astype(np.int64)
            cnts = (hi - lo).astype(np.int64)
        else:
            sums = np.zeros(len(lt), np.int64)
            cnts = np.zeros(len(lt), np.int64)
        lidx = pa.array(np.nonzero(lmask)[0], pa.int64())
        return pa.table({left_id: pa.array(ids),
                         key: group[key].take(lidx),
                         "t": pa.array(lt),
                         out_col: pa.array(sums),
                         n_col: pa.array(cnts)})

    return (tagged.map_batches(add_kb, batch_format="pyarrow")
            .groupby("__kb").map_groups(match, batch_format="pyarrow"))


def _distinct_keys(ds: ray.data.Dataset, on: tuple,
                   num_partitions: int = 16) -> ray.data.Dataset:
    """Distinct key rows via batch-local Arrow combiner + one bucketed
    groupby (the same shape as dedup._distinct_pairs, generalized to any
    key tuple); only key rows shuffle."""
    cols = list(on)
    _NB = 64

    def part(b: pa.Table) -> pa.Table:
        t = b.select(cols).group_by(cols).aggregate([])
        if t.num_rows == 0:
            return t.append_column("__db", pa.array([], pa.int64()))
        h = pd.util.hash_array(
            t[cols[0]].to_numpy(zero_copy_only=False)).astype(np.uint64)
        for c in cols[1:]:
            h = h * np.uint64(0x100000001B3) ^ pd.util.hash_array(
                t[c].to_numpy(zero_copy_only=False)).astype(np.uint64)
        return t.append_column(
            "__db", pa.array((h % np.uint64(_NB)).astype(np.int64),
                             pa.int64()))

    def merge(g: pa.Table) -> pa.Table:
        return g.select(cols).group_by(cols).aggregate([])

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby("__db").map_groups(merge, batch_format="pyarrow")
            .repartition(num_partitions))  # scrub untyped empty blocks


def intersect_distinct(left: ray.data.Dataset, right: ray.data.Dataset, *,
                       on: tuple, right_on: tuple | None = None,
                       num_partitions: int = 16,
                       bloom_bits: int | None = None) -> ray.data.Dataset:
    """SQL ``INTERSECT``: the distinct ``on`` rows of ``left`` that also
    appear in ``right`` — distinct-then-semi-join, so both sides reduce
    to key rows before any shuffle. ``bloom_bits`` prefilters like
    :func:`semi_join`."""
    return semi_join(_distinct_keys(left, tuple(on), num_partitions),
                     right, on=on, right_on=right_on,
                     num_partitions=num_partitions, bloom_bits=bloom_bits)


def except_distinct(left: ray.data.Dataset, right: ray.data.Dataset, *,
                    on: tuple, right_on: tuple | None = None,
                    num_partitions: int = 16,
                    bloom_bits: int | None = None) -> ray.data.Dataset:
    """SQL ``EXCEPT``: the distinct ``on`` rows of ``left`` with no match
    in ``right`` — distinct-then-anti-join. ``bloom_bits`` lets the
    definitely-absent majority (the usual EXCEPT result at scale) bypass
    the join shuffle entirely."""
    return anti_join(_distinct_keys(left, tuple(on), num_partitions),
                     right, on=on, right_on=right_on,
                     num_partitions=num_partitions, bloom_bits=bloom_bits)


def interpolate_asof(left: ray.data.Dataset, right: ray.data.Dataset, *,
                     key: str, ts: str, left_id: str, right_id: str,
                     right_val: str, out_col: str = "v_interp",
                     default: int = -1, scale: int = 100,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """→ (left_id, out_col) — time-series ALIGNMENT: for every left row,
    the right-side value linearly interpolated at the left timestamp
    between the latest right row at-or-before (ties → max id) and the
    earliest strictly-after (ties → min id), per key. All arithmetic is
    exact int64 — ``(v0·(t1−t) + v1·(t−t0)) // (t1−t0)`` over
    fixed-point units and epoch-µs — so the SQL oracle value-matches
    bit-for-bit (non-negative operands: floor ≡ trunc). Edges: only a
    preceding row → hold-last (v0); only a following → backfill (v1);
    neither → ``default``; an exact-timestamp match falls out of the
    formula (t = t0 ⇒ v0).

    Scale shape: the standard slim tag-union co-group on a coarse
    key-hash bucket (one shuffle; probes carry (key, t, id), values
    carry (key, t, id, v)); the kernel walks key segments and matches
    every probe in a segment with two vectorized searchsorteds."""
    def tag_l(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            key: b[key], "__t": pc.cast(b[ts], pa.int64()),
            "__id": pc.cast(b[left_id], pa.int64()),
            "__v": pa.array(np.zeros(n, np.int64)),
            "__side": pa.array(np.zeros(n, np.int8)),
        })

    def tag_r(b: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(b[right_val], pa.float64()), float(scale)),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({
            key: b[key], "__t": pc.cast(b[ts], pa.int64()),
            "__id": pc.cast(b[right_id], pa.int64()), "__v": v,
            "__side": pa.array(np.ones(b.num_rows, np.int8)),
        })

    from ..stages.windows import _add_key_bucket

    tagged = (left.map_batches(tag_l, batch_format="pyarrow")
              .union(right.map_batches(tag_r, batch_format="pyarrow"))
              .map_batches(_add_key_bucket(key), batch_format="pyarrow"))

    def interp(group: pa.Table) -> pa.Table:
        # Arrow-native AND loop-free (the pandas version looped per
        # key): right rows lexsorted by (key, t, id); nxt = structured
        # searchsorted of (key, t, +inf) — the earliest strictly-after
        # row (ties → min id) — and prv = nxt−1 the latest at-or-before
        # (ties → max id); same-key checks gate the edge cases.
        keys_np = group[key].to_numpy(zero_copy_only=False)
        sides = group["__side"].to_numpy(zero_copy_only=False)
        ts_ = group["__t"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids_all = group["__id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        _, inv = np.unique(keys_np, return_inverse=True)
        inv = inv.astype(np.int64)
        lmask = sides == 0
        t, ids, linv = ts_[lmask], ids_all[lmask], inv[lmask]
        if not len(t):
            z = pa.array([], pa.int64())
            return pa.table({left_id: z, out_col: z})
        rinv, rt, rid_ = inv[~lmask], ts_[~lmask], ids_all[~lmask]
        rv = group["__v"].to_numpy(
            zero_copy_only=False).astype(np.int64)[~lmask]
        vi = np.full(len(t), default, np.int64)
        if len(rt):
            o = np.lexsort((rid_, rt, rinv))
            rinv_s, rt_s, rv_s = rinv[o], rt[o], rv[o]
            ev = np.ascontiguousarray(np.column_stack(
                [rinv_s, rt_s, rid_[o]])).view("i8,i8,i8").ravel()
            pv = np.ascontiguousarray(np.column_stack(
                [linv, t, np.full(len(t), np.iinfo(np.int64).max)])
            ).view("i8,i8,i8").ravel()
            nxt = np.searchsorted(ev, pv, side="left")
            prv = nxt - 1
            p = np.clip(prv, 0, None)
            nx = np.clip(nxt, None, len(rt) - 1)
            has0 = (prv >= 0) & (rinv_s[p] == linv)
            has1 = (nxt < len(rt)) & (rinv_s[nx] == linv)
            t0 = np.where(has0, rt_s[p], 0)
            v0 = np.where(has0, rv_s[p], 0)
            t1 = np.where(has1, rt_s[nx], 0)
            v1 = np.where(has1, rv_s[nx], 0)
            both = has0 & has1
            den = np.where(both, t1 - t0, 1)
            vi = np.where(both,
                          (v0 * (t1 - t) + v1 * (t - t0)) // den, vi)
            vi = np.where(has0 & ~has1, v0, vi)
            vi = np.where(~has0 & has1, v1, vi)
        return pa.table({left_id: pa.array(ids),
                         out_col: pa.array(vi.astype(np.int64))})

    return tagged.groupby("__kb").map_groups(interp, batch_format="pyarrow")


def interval_overlap_pairs(ds: ray.data.Dataset, *, key_col: str,
                           id_col: str, start_col: str, end_col: str,
                           max_pairs_per_key: int = 1_000_000
                           ) -> ray.data.Dataset:
    """Self interval-overlap join within keys: → (key, id_a, id_b,
    overlap_us) for every pair of rows of the same key whose
    [start, end] intervals intersect (closed ends, ``id_a < id_b``) —
    the temporal-conflict / concurrency-detection operator.

    One coarse key-hash bucket shuffle (slim projection only), then a
    vectorized sweep inside each bucket: rows sort by (key, start, id);
    with starts ascending, the partners of row i are EXACTLY the
    contiguous run of later rows whose start <= end_i (their own ends
    can only reach further right), so one searchsorted per segment +
    a repeat/arange expansion emits every pair without a Python loop
    and without the all-pairs product. A key expanding past
    ``max_pairs_per_key`` raises loudly (quadratic guard — overlap
    volume is data, not plan, so the cap names the fix: narrower
    intervals or a pre-filter)."""
    from .windows import _add_key_bucket

    slim = ds.select_columns([key_col, id_col, start_col, end_col])

    def pairs_bulk(group: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            return pa.table({
                key_col: pa.array([], group[key_col].type
                                  if key_col in group.schema.names
                                  else pa.int64()),
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "overlap_us": pa.array([], pa.int64())})

        if key_col not in group.schema.names or not group.num_rows:
            return empty()
        keys = group[key_col].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = group[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = group[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _, kinv = np.unique(keys, return_inverse=True)
        order = np.lexsort((ids, s, kinv))
        kinv, ids, s, e = kinv[order], ids[order], s[order], e[order]
        n = len(ids)
        # partners of i: the contiguous run of later rows j of the same
        # key with s_j <= e_i; one structured-view searchsorted over the
        # (key, start) order finds every run end at once (same probe
        # trick as the asof kernels above)
        base = np.ascontiguousarray(
            np.column_stack([kinv, s])).view("i8,i8").ravel()
        probes = np.ascontiguousarray(
            np.column_stack([kinv, e])).view("i8,i8").ravel()
        hi = np.searchsorted(base, probes, side="right")
        cnt = hi - np.arange(n) - 1
        cnt = np.maximum(cnt, 0)
        total = int(cnt.sum())
        # per-KEY quadratic guard (the cap names a degenerate key, not a
        # busy bucket): segment-sum the candidate counts
        seg_start = np.zeros(n, bool)
        seg_start[0] = True
        seg_start[1:] = kinv[1:] != kinv[:-1]
        per_key = np.add.reduceat(cnt, np.nonzero(seg_start)[0])
        if len(per_key) and int(per_key.max()) > max_pairs_per_key:
            bad = keys[order][np.nonzero(seg_start)[0][int(per_key.argmax())]]
            raise ValueError(
                f"interval_overlap_pairs: key {bad!r} expands to "
                f"{int(per_key.max())} pairs (> {max_pairs_per_key}); "
                "narrow the intervals, pre-filter the rows, or raise "
                "max_pairs_per_key")
        if total == 0:
            return empty()
        ii = np.repeat(np.arange(n), cnt)
        jj = (np.arange(total)
              - np.repeat(np.cumsum(cnt) - cnt, cnt)
              + ii + 1)
        # the run guarantees s_j <= e_i (the necessary half); verify the
        # symmetric half s_i <= e_j so inverted intervals (end < start —
        # present in malformed data) never over-match
        keep = s[ii] <= e[jj]
        ii, jj = ii[keep], jj[keep]
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        ov = np.minimum(e[ii], e[jj]) - np.maximum(s[ii], s[jj])
        out_keys = keys[order][ii]
        return pa.table({key_col: pa.array(out_keys),
                         "id_a": pa.array(a), "id_b": pa.array(b),
                         "overlap_us": pa.array(ov)})

    out = (slim.map_batches(_add_key_bucket(key_col),
                            batch_format="pyarrow")
           .groupby("__kb").map_groups(pairs_bulk, batch_format="pyarrow"))
    from .windows import _union_typed_empty
    return _union_typed_empty(out, ds, [
        (key_col, key_col), ("id_a", pa.int64()),
        ("id_b", pa.int64()), ("overlap_us", pa.int64())])
