"""Deduplication suite for large-scale training-data pipelines.

The reference only has exact ``set()`` alias dedup (D1/D2, SURVEY.md §2.7);
the near-dup families are required engine extensions:

- exact:       content-hash → groupby(hash) keep min-id (hash-partition +
               per-group first)
- MinHash-LSH: shingle → minhash → slim (band_key, id, b-bit sketch) rows
               → groupby(band) → sketch-prefiltered candidate pairs →
               signature join-back → estimated-Jaccard verify → connected
               components → keep min-id representative
- SimHash:     64-bit fingerprint → 4×16-bit band buckets → Hamming verify
- n-gram Jaccard: EXACT prefix-filtered similarity self-join (All-Pairs /
               PPJoin prefix tokens → groupby → verify), recall 1 at the
               threshold — plus minhash.jaccard as the pairwise verifier
- embedding:   random-hyperplane signs over the vector column → band
               buckets → cosine verify

Every pair-generating groupby caps pairs per bucket (skew guard) and the
cap is surfaced in the result metrics — no silent truncation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import hash_strings, hash_strings_arrow, splitmix64
from ..functions.minhash import (band_keys, shingle_hashes, signature_matrix,
                                 word_shingle_hashes)
from ..functions.simhash import simhash64

U64 = np.uint64


def add_content_hash(batch: pa.Table, col: str = "text", out: str = "content_hash") -> pa.Table:
    return batch.append_column(out, pa.array(hash_strings_arrow(batch[col]), pa.int64()))


def exact_dedup(ds: ray.data.Dataset, col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the min-id row per distinct content (deterministic winner).
    Shuffle key is a COARSE bucket of the 63-bit content hash — one
    vectorized sort + drop_duplicates per bucket, not one Python call per
    distinct document (every unique doc is its own group otherwise)."""
    _CB = 256

    def hash_and_bucket(b: pa.Table) -> pa.Table:
        t = add_content_hash(b, col)
        return t.append_column(
            "__cb", pc.bit_wise_and(t["content_hash"],
                                    pa.scalar(_CB - 1, pa.int64())))

    hashed = ds.map_batches(hash_and_bucket, batch_format="pyarrow")

    def keep_min(group: pa.Table) -> pa.Table:
        # Arrow-native: lexsort + first-per-hash mask, winners gathered
        # by take (no per-group pandas frame)
        h = group["content_hash"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        if np.issubdtype(ids.dtype, np.number):
            order = np.lexsort((ids, h))
        else:
            _, icodes = np.unique(ids, return_inverse=True)
            order = np.lexsort((icodes, h))
        hs = h[order]
        first = np.ones(len(hs), bool)
        first[1:] = hs[1:] != hs[:-1]
        return group.take(pa.array(order[first], pa.int64()))

    out = hashed.groupby("__cb").map_groups(keep_min, batch_format="pyarrow")
    return out.drop_columns(["content_hash", "__cb"])


def _pack_bbit_sketch(sigs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """b-bit minwise sketch (Li & König 2010, b=2): keep the two low bits
    of each per-permutation minimum, packed one bit-plane per int64 word.
    For a pair at Jaccard J the expected Hamming distance over the
    2·num_perm stored bits is (1-J)·num_perm — a 16-byte proxy that
    prefilters candidates without shipping the 8·num_perm-byte signature."""
    n, num_perm = sigs.shape
    assert num_perm <= 64, "sketch packs one bit per perm per word"
    w = np.uint64(1) << np.arange(num_perm, dtype=U64)
    sk0 = ((sigs & U64(1)) * w).sum(axis=1, dtype=U64)
    sk1 = (((sigs >> U64(1)) & U64(1)) * w).sum(axis=1, dtype=U64)
    return sk0.view(np.int64), sk1.view(np.int64)


def _sketch_cut(jaccard_threshold: float, num_perm: int) -> int:
    """Hamming cutoff for the 2-bit sketch at +4σ above the threshold's
    expected distance (pass prob ≈ 1-3e-5 for true pairs — far below the
    banding miss floor) — kills the bulk of random co-bucket pairs."""
    q = 1.0 - jaccard_threshold
    var = num_perm * (1.5 * q - q * q)
    return int(np.ceil(q * num_perm + 4.0 * np.sqrt(max(var, 0.0)))) + 2


def minhash_band_rows(ds: ray.data.Dataset, col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, num_bands: int = 16, shingle_k: int = 5) -> ray.data.Dataset:
    """Explode each row into SLIM (band_key, id, __sk0, __sk1) rows — the
    full signature (num_perm × 8 bytes) never rides the band shuffle
    (×num_bands it would replicate); only the 16-byte b-bit sketch does,
    for in-bucket prefiltering. Verification joins signatures back per
    surviving pair (see :func:`lsh_candidate_pairs`)."""

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[col].to_pylist()
        sigs = signature_matrix(texts, num_perm=num_perm, k=shingle_k)
        bks = band_keys(sigs, num_bands=num_bands)
        sk0, sk1 = _pack_bbit_sketch(sigs)
        n = len(texts)
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), num_bands), pa.int64())
        return pa.table({
            "band_key": pa.array(bks.reshape(-1), pa.int64()),
            id_col: batch[id_col].take(rep),
            "__sk0": pa.array(np.repeat(sk0, num_bands), pa.int64()),
            "__sk1": pa.array(np.repeat(sk1, num_bands), pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def _capped_upper_pairs(keys: np.ndarray, ids: np.ndarray,
                        cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Shared numpy core of the in-bucket self-merges: dedup (key, id),
    sort by (key, id), cap each key at its first ``cap`` rows, and emit
    every within-key unordered pair as (row_idx_a, row_idx_b) into the
    ORIGINAL arrays with id_a < id_b (ascending id order inside the
    segment). Replaces the per-group pandas merge(g, g) — no frame, no
    materialized cross product beyond the capped pair arrays."""
    if ids.dtype.kind in "OUS":
        _, icode = np.unique(ids, return_inverse=True)
    else:
        icode = ids
    order = np.lexsort((icode, keys))
    ks, is_ = keys[order], icode[order]
    keep = np.ones(len(ks), bool)
    if len(ks) > 1:
        keep[1:] = (ks[1:] != ks[:-1]) | (is_[1:] != is_[:-1])
    order, ks = order[keep], ks[keep]
    n = len(ks)
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z
    new = np.ones(n, bool)
    new[1:] = ks[1:] != ks[:-1]
    starts = np.nonzero(new)[0]
    seg = np.cumsum(new) - 1
    pos = np.arange(n) - starts[seg]
    m = pos < cap
    order, ks = order[m], ks[m]
    n = len(ks)
    new = np.ones(n, bool)
    new[1:] = ks[1:] != ks[:-1]
    starts = np.nonzero(new)[0]
    cnt = np.diff(np.append(starts, n))
    seg = np.cumsum(new) - 1
    pos = np.arange(n) - starts[seg]
    reps = cnt[seg] - pos - 1
    ai = np.repeat(np.arange(n, dtype=np.int64), reps)
    off = (np.arange(int(reps.sum()), dtype=np.int64)
           - np.repeat(np.concatenate(
               [[np.int64(0)], np.cumsum(reps)[:-1]]), reps) + 1)
    return order[ai], order[ai + off]


def _popcount64_2d(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a u64 array of any shape (returns int64)."""
    b = x.astype(U64, copy=False).reshape(-1).view(np.uint8).reshape(-1, 8)
    return np.unpackbits(b, axis=1).sum(axis=1, dtype=np.int64).reshape(x.shape)


def lsh_candidate_pairs(ds: ray.data.Dataset, col: str = "text", id_col: str = "doc_id",
                        num_perm: int = 64, num_bands: int = 16, shingle_k: int = 5,
                        jaccard_threshold: float = 0.7,
                        max_pairs_per_bucket: int = 10_000,
                        num_partitions: int = 16,
                        pair_mode: str = "auto") -> ray.data.Dataset:
    """MinHash-LSH near-dup pairs (id_a < id_b, est_jaccard ≥ threshold).

    TWO-PHASE SHUFFLE (the 100-TB shape, same design as
    :func:`embedding_dup_pairs`): the band stage ships only
    (band_key, id, 16-byte sketch) rows; within a bucket, candidate pairs
    are prefiltered by sketch Hamming distance (vectorized, blocked so a
    pathological bucket never materializes an n² index array) and capped
    per bucket (quadratic skew guard). Survivors get their two FULL
    signatures back for the exact est_jaccard verify; ``pair_mode``:

    - ``"broadcast"``: candidate pairs collect on the driver (bounded by
      the caps), the needed signatures come from ONE filtered scan of
      ``ds``, and the verify is a single vectorized pass — right up to
      ``_BROADCAST_PAIRS_CAP`` candidates.
    - ``"join"``: fully distributed — candidates are distinct-ed on a
      bucketed hash and the two signatures join back per pair (two hash
      joins against the slim (id, packed-sig) projection). No pair-scaled
      driver state; the 100-TB path.
    - ``"auto"`` (default): broadcast below the cap, join above.
    """
    band_rows = minhash_band_rows(ds, col, id_col, num_perm, num_bands, shingle_k)
    cut = _sketch_cut(jaccard_threshold, num_perm)
    # cap ROWS per band key so the self-merge stays under the pair cap —
    # n(n-1)/2 ≤ max_pairs_per_bucket (quadratic skew guard; deterministic:
    # min-id rows survive, so giant dup clusters stay CC-connected)
    max_rows_per_key = int((1 + np.sqrt(1 + 8 * max_pairs_per_bucket)) // 2)
    _CB = 256  # coarse buckets: one vectorized self-merge each, not one
    # pandas call per band key (~n_docs × num_bands tiny groups otherwise)

    def coarse(b: pa.Table) -> pa.Table:
        cb = pc.bit_wise_and(b["band_key"], pa.scalar(_CB - 1, pa.int64()))
        return b.append_column("__cb", cb)

    def cand_pairs_bulk(group: pa.Table) -> pa.Table:
        # Arrow-native in-bucket self-merge: shared capped-pair core +
        # vectorized b-bit Hamming prefilter (no per-group pandas merge)
        keys = group["band_key"].to_numpy(zero_copy_only=False)
        ids = np.asarray(group[id_col].to_pylist())
        a, b_ = _capped_upper_pairs(keys, ids, max_rows_per_key)
        if not len(a):
            return pa.table({"id_a": group[id_col].slice(0, 0),
                             "id_b": group[id_col].slice(0, 0)})
        sk0 = group["__sk0"].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(U64)
        sk1 = group["__sk1"].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(U64)
        h = (_popcount64_2d(sk0[a] ^ sk0[b_])
             + _popcount64_2d(sk1[a] ^ sk1[b_]))
        m = h <= cut
        return pa.table({"id_a": pa.array(ids[a[m]]),
                         "id_b": pa.array(ids[b_[m]])})

    cand = (band_rows.map_batches(coarse, batch_format="pyarrow")
            .groupby("__cb").map_groups(cand_pairs_bulk,
                                        batch_format="pyarrow")
            .materialize())
    if pair_mode == "auto":
        pair_mode = ("broadcast" if cand.count() <= _BROADCAST_PAIRS_CAP
                     else "join")

    def sig_packed(texts: list) -> list[bytes]:
        return [s.tobytes() for s in
                signature_matrix(texts, num_perm=num_perm, k=shingle_k)]

    def est_from_packed(pa_bytes, pb_bytes) -> np.ndarray:
        Sa = np.frombuffer(b"".join(pa_bytes), U64).reshape(-1, num_perm)
        Sb = np.frombuffer(b"".join(pb_bytes), U64).reshape(-1, num_perm)
        return (Sa == Sb).mean(axis=1)

    if pair_mode == "broadcast":
        pairs_pd = cand.to_pandas().drop_duplicates(subset=["id_a", "id_b"])
        if not len(pairs_pd):
            return _ensure_pair_schema(cand, "est_jaccard")
        need = np.unique(np.concatenate([pairs_pd["id_a"].to_numpy(),
                                         pairs_pd["id_b"].to_numpy()]))
        need_ref = ray.put(need)

        def pick(b: pa.Table) -> pa.Table:
            mask = np.isin(np.asarray(b[id_col].to_pylist()), ray.get(need_ref))
            sel = b.filter(pa.array(mask))
            return pa.table({id_col: sel[id_col],
                             "__sig": pa.array(sig_packed(sel[col].to_pylist()),
                                               pa.binary())})

        got = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
        sig = dict(zip(got[id_col], got["__sig"]))
        est = est_from_packed([sig[i] for i in pairs_pd["id_a"]],
                              [sig[i] for i in pairs_pd["id_b"]])
        keep = est >= jaccard_threshold
        out = pa.table({
            "id_a": pa.array(pairs_pd["id_a"].to_numpy()[keep]),
            "id_b": pa.array(pairs_pd["id_b"].to_numpy()[keep]),
            "est_jaccard": pa.array(est[keep], pa.float64()),
        })
        return _ensure_pair_schema(ray.data.from_arrow(out), "est_jaccard")

    # join mode: bucketed distinct over id pairs, then two hash joins
    # against the slim (id, packed-sig) projection — same shape as
    # embedding_dup_pairs' join mode
    pairs_d = _distinct_pairs(cand, num_partitions)

    def as_side(side: str):
        def prep(b: pa.Table) -> pa.Table:
            return pa.table({f"id_{side}": b[id_col],
                             f"__sig_{side}": pa.array(sig_packed(b[col].to_pylist()),
                                                       pa.binary())})
        return prep

    sig_a = ds.map_batches(as_side("a"), batch_format="pyarrow")
    sig_b = ds.map_batches(as_side("b"), batch_format="pyarrow")
    withs = (pairs_d.join(sig_a, "inner", num_partitions,
                          on=("id_a",), right_on=("id_a",))
             # scrub the zero-column blocks the first join emits for
             # empty partitions before they feed the second join
             # (a join partition fed only those fails — see
             # stages/joins.drop_empty_blocks)
             .repartition(num_partitions)
             .join(sig_b, "inner", num_partitions,
                   on=("id_b",), right_on=("id_b",)))

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                             "est_jaccard": pa.array([], pa.float64())})
        est = est_from_packed(b["__sig_a"].to_pylist(), b["__sig_b"].to_pylist())
        keep = pa.array(np.nonzero(est >= jaccard_threshold)[0], pa.int64())
        return pa.table({
            "id_a": b["id_a"].take(keep),
            "id_b": b["id_b"].take(keep),
            "est_jaccard": pa.array(est[est >= jaccard_threshold], pa.float64()),
        })

    out = withs.map_batches(verify, batch_format="pyarrow")
    return _ensure_pair_schema(out, "est_jaccard")


# pairs above this broadcast-able size switch minhash_dedup to the keyed-join
# winner path automatically (≈ a few hundred MB of driver state at the cap)
_BROADCAST_PAIRS_CAP = 10_000_000


def _distinct_pairs(cand: ray.data.Dataset,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """Global distinct over (id_a, id_b) rows — bucketed Arrow groupby
    (Ray's native aggregate is slow at scale); only id-pair rows shuffle.
    The trailing .repartition scrubs Ray-groupby untyped empty blocks
    before any downstream hash join (a join partition fed only those
    fails — see :func:`_drop_losers_keyed`)."""
    _NB = 64

    def distinct_partial(b: pa.Table) -> pa.Table:
        part = b.group_by(["id_a", "id_b"]).aggregate([]) if b.num_rows else b
        if part.num_rows == 0:
            return part.append_column("__pb", pa.array([], pa.int64()))
        bk = hash_strings([f"{a}|{x}" for a, x in
                           zip(part["id_a"].to_pylist(), part["id_b"].to_pylist())])
        return part.append_column("__pb", pa.array(bk % _NB, pa.int64()))

    def distinct_merge(g: pa.Table) -> pa.Table:
        return g.select(["id_a", "id_b"]).group_by(["id_a", "id_b"]).aggregate([])

    return (cand.map_batches(distinct_partial, batch_format="pyarrow")
            .groupby("__pb").map_groups(distinct_merge, batch_format="pyarrow")
            .repartition(num_partitions))


def minhash_dedup(ds: ray.data.Dataset, col: str = "text", id_col: str = "doc_id",
                  num_perm: int = 64, num_bands: int = 16, shingle_k: int = 5,
                  jaccard_threshold: float = 0.7,
                  winner_mode: str = "auto",
                  num_partitions: int = 16) -> ray.data.Dataset:
    """Full near-dup removal: LSH pairs → connected components → keep the
    min-id representative of each dup cluster.

    ``winner_mode`` picks how component winners are resolved and losers
    removed (equivalence-tested against each other):

    - ``"broadcast"``: components + loser set collected on the driver and
      broadcast — O(|dup pairs|) driver memory; right up to
      ``_BROADCAST_PAIRS_CAP`` pairs.
    - ``"join"``: fully distributed — member (node, id) rows join component
      labels, winners come from a bucketed groupby-min, and losers are
      removed with a left-anti hash join. No corpus- or pair-scaled driver
      state; the 100-TB path.
    - ``"auto"`` (default): broadcast below the cap, join above.
    """
    pairs = lsh_candidate_pairs(ds, col, id_col, num_perm, num_bands,
                                shingle_k, jaccard_threshold,
                                num_partitions=num_partitions).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ds
    if winner_mode == "auto":
        winner_mode = "broadcast" if n_pairs <= _BROADCAST_PAIRS_CAP else "join"
    if winner_mode == "join":
        return _drop_losers_keyed(ds, pairs, id_col, num_partitions=num_partitions)
    return _drop_losers_broadcast(ds, pairs, id_col)


def _drop_losers_broadcast(ds: ray.data.Dataset, pairs: ray.data.Dataset,
                           id_col: str) -> ray.data.Dataset:
    """Broadcast winner selection + loser removal — the small-pair-set
    twin of :func:`_drop_losers_keyed` (same min-id winner semantics,
    equivalence-tested): components + loser set collected on the driver
    (O(|dup pairs|) memory, callers gate on ``_BROADCAST_PAIRS_CAP``) and
    broadcast once via ``ray.put``; removal is a single filter pass over
    ``ds`` — no joins, no shuffle, and payload columns (including
    ``list<float>`` vectors Acero joins reject) pass through untouched."""
    from .clustering import connected_components

    # node-hash ↔ id map for the ids that appear in any dup pair (bounded by
    # |pairs|, small relative to the corpus; scale path: _drop_losers_keyed)
    hash_to_id: dict[int, object] = {}
    edge_list: list[tuple[int, int]] = []
    for b in pairs.iter_batches(batch_format="pyarrow"):
        a_ids = b["id_a"].to_pylist()
        b_ids = b["id_b"].to_pylist()
        ha = hash_strings([str(x) for x in a_ids])
        hb = hash_strings([str(x) for x in b_ids])
        for x, h in zip(a_ids, ha):
            hash_to_id[int(h)] = x
        for x, h in zip(b_ids, hb):
            hash_to_id[int(h)] = x
        edge_list.extend(zip((int(x) for x in ha), (int(x) for x in hb)))

    edges_tbl = pa.table({
        "src": pa.array([a for a, _ in edge_list], pa.int64()),
        "dst": pa.array([b for _, b in edge_list], pa.int64()),
    })
    labels = connected_components(ray.data.from_arrow(edges_tbl))

    # winner of each dup component = min ORIGINAL id (not min hash)
    comps: dict[int, list] = {}
    for b in labels.iter_batches(batch_format="pyarrow"):
        for n, l in zip(b["node"].to_pylist(), b["label"].to_pylist()):
            comps.setdefault(l, []).append(hash_to_id[n])
    losers: set = set()
    for members in comps.values():
        members.sort()
        losers.update(members[1:])
    losers_ref = ray.put(losers)

    def drop_losers(batch: pa.Table) -> pa.Table:
        lose = ray.get(losers_ref)
        mask = pa.array([x not in lose for x in batch[id_col].to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(drop_losers, batch_format="pyarrow")


def _drop_losers_keyed(ds: ray.data.Dataset, pairs: ray.data.Dataset,
                       id_col: str, num_partitions: int = 16) -> ray.data.Dataset:
    """Distributed winner selection + loser removal for minhash_dedup:
    no driver-side component map or loser set (the keyed-join scale path
    the broadcast branch documents).

    pairs(id_a, id_b) → CC labels over id-hash nodes → distinct member
    (node, id) rows join their label → per-label min-id winner (bucketed
    Arrow groupby — Ray's native aggregate is slow at scale) → losers =
    members whose id != winner → left-ANTI hash join removes them from
    ``ds``. Everything shuffles 63-bit hashes + ids, never document text.
    """
    from .clustering import connected_components

    _NB = 64

    def edge_rows(batch: pa.Table) -> pa.Table:
        ha = hash_strings([str(x) for x in batch["id_a"].to_pylist()])
        hb = hash_strings([str(x) for x in batch["id_b"].to_pylist()])
        return pa.table({"src": pa.array(ha, pa.int64()), "dst": pa.array(hb, pa.int64())})

    labels = connected_components(
        pairs.map_batches(edge_rows, batch_format="pyarrow"),
        num_partitions=num_partitions)

    def member_partial(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].combine_chunks()
        b = batch["id_b"].combine_chunks().cast(a.type)
        ids = a.to_pylist() + b.to_pylist()
        h = hash_strings([str(x) for x in ids])
        t = pa.table({"node": pa.array(h, pa.int64()),
                      "member_id": pa.concat_arrays([a, b])})
        part = (t.group_by("node").aggregate([("member_id", "min")])
                .rename_columns(["node", "member_id"]))
        bk = part["node"].to_numpy(zero_copy_only=False) % _NB
        return part.append_column("__bucket", pa.array(bk, pa.int64()))

    def member_merge(group: pa.Table) -> pa.Table:
        return (group.group_by("node").aggregate([("member_id", "min")])
                .rename_columns(["node", "member_id"]))

    # .repartition after each groupby: Ray's sort-based groupby emits
    # UNTYPED empty blocks for empty partitions, and a hash-join partition
    # fed only those fails ("no match for FieldRef" — reproduced on Ray
    # 2.49); repartition rebuilds blocks from real rows, scrubbing them.
    members = (pairs.map_batches(member_partial, batch_format="pyarrow")
               .groupby("__bucket").map_groups(member_merge, batch_format="pyarrow")
               .repartition(num_partitions))

    with_label = members.join(labels, "inner", num_partitions,
                              on=("node",), right_on=("node",)) \
        .repartition(num_partitions)  # feeds the winners join below

    def winner_partial(batch: pa.Table) -> pa.Table:
        part = (batch.select(["label", "member_id"]).group_by("label")
                .aggregate([("member_id", "min")])
                .rename_columns(["label", "winner_id"]))
        bk = part["label"].to_numpy(zero_copy_only=False) % _NB
        return part.append_column("__bucket", pa.array(bk, pa.int64()))

    def winner_merge(group: pa.Table) -> pa.Table:
        return (group.group_by("label").aggregate([("winner_id", "min")])
                .rename_columns(["label", "winner_id"]))

    winners = (with_label.map_batches(winner_partial, batch_format="pyarrow")
               .groupby("__bucket").map_groups(winner_merge, batch_format="pyarrow")
               .repartition(num_partitions))  # scrub untyped empties (see above)

    labeled_members = with_label.join(winners, "inner", num_partitions,
                                      on=("label",), right_on=("label",))

    def to_losers(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch["member_id"], batch["winner_id"])
        sel = batch.filter(keep)
        return pa.table({id_col: sel["member_id"],
                         "__lose": pa.array(np.ones(sel.num_rows, np.int8))})

    # same untyped-empty scrub as above: with few pairs most loser
    # partitions are empty, and the final hash join chokes on them
    losers = (labeled_members.map_batches(to_losers, batch_format="pyarrow")
              .repartition(num_partitions))
    joined = ds.join(losers, "left_outer", num_partitions,
                     on=(id_col,), right_on=(id_col,))

    def drop(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_null(batch["__lose"])).drop_columns(["__lose"])

    return joined.map_batches(drop, batch_format="pyarrow")


def simhash_fingerprints(ds: ray.data.Dataset, col: str = "text",
                         id_col: str = "doc_id") -> ray.data.Dataset:
    def fp(batch: pa.Table) -> pa.Table:
        sigs = [simhash64(t) for t in batch[col].to_pylist()]
        # int64 view of the u64 fingerprint (bit pattern preserved)
        s = np.array(sigs, dtype=np.uint64).view(np.int64)
        return pa.table({id_col: batch[id_col], "simhash": pa.array(s, pa.int64())})

    return ds.map_batches(fp, batch_format="pyarrow")


def simhash_dup_pairs(ds: ray.data.Dataset, col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3,
                      max_pairs_per_bucket: int = 10_000) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: band on each of the four 16-bit chunks
    (any pair within Hamming ≤ 3 of 64 bits shares at least one exact
    16-bit chunk by pigeonhole when ≤ 3 chunks differ)."""
    fps = simhash_fingerprints(ds, col, id_col)

    def explode(batch: pa.Table) -> pa.Table:
        s = batch["simhash"].to_numpy(zero_copy_only=False).view(U64)
        n = len(s)
        # [n, 4] chunk keys, vectorized (no per-band Python loop)
        shifts = (np.arange(4, dtype=U64) * U64(16))[None, :]
        chunks = ((s[:, None] >> shifts) & U64(0xFFFF)).astype(np.int64)
        keys = (chunks << 3) | np.arange(4, dtype=np.int64)[None, :]
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), 4), pa.int64())
        return pa.table({
            "bucket": pa.array(keys.reshape(-1), pa.int64()),
            id_col: batch[id_col].take(rep),
            "simhash": batch["simhash"].take(rep),
        })

    # coarse-bucket shuffle + one vectorized self-merge per group (one
    # pandas call per raw 16-bit chunk bucket collapses at ~2^19 groups);
    # per-key row cap keeps each self-merge under the pair cap (skew
    # guard — deterministic: min-id rows survive)
    max_rows_per_key = int((1 + np.sqrt(1 + 8 * max_pairs_per_bucket)) // 2)
    _CB = 256

    def coarse(b: pa.Table) -> pa.Table:
        # mix before masking: the raw key is (chunk << 3) | band with band
        # in 0..3, so the low 8 bits only span 128 values (see the same
        # fix in embedding_dup_pairs)
        raw = b["bucket"].to_numpy(zero_copy_only=False).astype(U64)
        cb = (splitmix64(raw) & U64(_CB - 1)).astype(np.int64)
        return b.append_column("__cb", pa.array(cb, pa.int64()))

    def pairs_bulk(group: pa.Table) -> pa.Table:
        keys = group["bucket"].to_numpy(zero_copy_only=False)
        ids = np.asarray(group[id_col].to_pylist())
        a, b_ = _capped_upper_pairs(keys, ids, max_rows_per_key)
        if not len(a):
            return pa.table({"id_a": group[id_col].slice(0, 0),
                             "id_b": group[id_col].slice(0, 0),
                             "hamming": pa.array([], pa.int64())})
        sh = group["simhash"].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(U64)
        d = _popcount64_2d(sh[a] ^ sh[b_])
        m = d <= max_hamming
        return pa.table({"id_a": pa.array(ids[a[m]]),
                         "id_b": pa.array(ids[b_[m]]),
                         "hamming": pa.array(d[m].astype(np.int64),
                                             pa.int64())})

    cand = (fps.map_batches(explode, batch_format="pyarrow")
            .map_batches(coarse, batch_format="pyarrow")
            .groupby("__cb").map_groups(pairs_bulk, batch_format="pyarrow"))
    from .agg import bucketed_agg

    # pair-key cardinality scales with dup volume — bucketed min
    return bucketed_agg(cand, ["id_a", "id_b"],
                        [("hamming", "min", "hamming")])


def ngram_jaccard_dup_pairs(ds: ray.data.Dataset, col: str = "text",
                            id_col: str = "doc_id", threshold: float = 0.7,
                            unit: str = "word", shingle_k: int = 3,
                            hh_min_df: int | None = None,
                            max_docs_per_token: int = 512,
                            num_partitions: int = 16,
                            pair_mode: str = "auto",
                            on_token_overflow: str = "error") -> ray.data.Dataset:
    """EXACT k-shingle Jaccard similarity self-join via df-ordered prefix
    filtering (Bayardo et al. "Scaling Up All Pairs Similarity Search",
    WWW'07; Xiao et al. PPJoin) — the exact counterpart of the
    MinHash-LSH estimate, with guaranteed recall 1 at ``threshold``:

    - each doc's distinct shingle hashes are sorted under ONE global total
      order; its PREFIX is the first ``n - ceil(threshold * n) + 1``
      entries. Lemma: J(A,B) >= t implies |A∩B| >= ceil(t·|A|), so the
      two prefixes must share at least one element — blocking on prefix
      tokens loses no true pair, for ANY consistent total order.
    - the order is ascending DOCUMENT FREQUENCY (ties by hash): a first
      word-count-shaped pass (batch-local combiner → groupby sum) counts
      each shingle's df exactly, and tokens with df >= ``hh_min_df`` are
      broadcast once via ``ray.put`` as a sorted (token, df) map; tokens
      below it score df=1. Rare shingles therefore fill the prefixes and
      common shingles sort last — without this, English-like corpora
      put stop-shingles in every prefix and the blocking degenerates to
      the full cross product (measured: 2.17M candidates over 500 docs
      with hash order, a few hundred with df order). At 10^12-doc scale
      set ``hh_min_df ~ εN``: the map stays broadcast-able AND every
      unmapped token's posting list is < εN docs by construction.
    - shingles are k-WORD grams by default (``unit="word"``, Broder
      w-shingling; ``unit="char"`` selects the k-char variant). Word
      grams keep a Zipfian df distribution even on template-heavy
      corpora, where the char-5-gram universe collapses to a few
      thousand grams all with high df and NO ordering can make prefixes
      selective (measured on the sf0.1 synthetic corpus: 2,041 distinct
      char-5-grams → 39.5M candidates over 5,000 docs, vs ~80k word
      trigrams with max df 15).
    - the shuffle carries only (prefix_token, id, set_size) rows — never
      the text or the shingle set (the same slim two-phase shape as
      :func:`embedding_dup_pairs`). Candidates are generated per
      hash-bucket of tokens with one vectorized pandas self-merge (not a
      Python call per token), pruned by the size filter
      ``min(|A|,|B|) >= t·max(|A|,|B|)``, capped per token
      (``max_docs_per_token``, skew guard) and globally distinct-ed,
      then verified by recomputing the two exact shingle sets from the
      joined-back texts. ``pair_mode`` follows the auto protocol of
      :func:`minhash_dedup`: driver broadcast below
      ``_BROADCAST_PAIRS_CAP`` candidates, distributed join above.
    - recall 1 at the threshold holds ONLY while no prefix token's
      posting list exceeds ``max_docs_per_token``. When one does, the
      guarantee would silently degrade, so the default
      ``on_token_overflow="error"`` fails loudly (same contract as
      :func:`dedup_new_against_corpus`'s broadcast cap) — remedies:
      raise ``max_docs_per_token``, lower ``hh_min_df`` so the common
      token sorts later and leaves the prefixes, or accept approximate
      recall explicitly with ``on_token_overflow="truncate"``.

    Output: (id_a, id_b, n_inter, n_union) with
    ``n_inter >= threshold * n_union`` — integer counts so the DuckDB
    oracle (list_intersect / list_distinct cardinalities) hash-matches
    with no float surface.
    """
    _MASK = np.uint64(0x7FFFFFFFFFFFFFFF)

    if unit == "word":
        def masked_shingles(s: str) -> np.ndarray:
            return word_shingle_hashes(s, shingle_k)  # already 63-bit int64
    else:
        def masked_shingles(s: str) -> np.ndarray:
            # mask to non-negative int64 BEFORE sorting so the prefix order
            # and the Ray groupby key agree (collisions only add candidates)
            return np.unique(
                (shingle_hashes(s, shingle_k) & _MASK).astype(np.int64))

    # ---- pass 1: exact per-shingle document frequency (word-count shape:
    # batch-local partial counts, then one small groupby-sum shuffle) ----
    if hh_min_df is None:
        hh_min_df = max(2, ds.count() // 250)

    def local_df(batch: pa.Table) -> pa.Table:
        parts = [masked_shingles(s) for s in batch[col].to_pylist()]
        parts = [p for p in parts if len(p)]
        if not parts:
            return pa.table({"__tok": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        toks, counts = np.unique(np.concatenate(parts), return_counts=True)
        return pa.table({"__tok": pa.array(toks, pa.int64()),
                         "c": pa.array(counts.astype(np.int64))})

    # bucketed Arrow groupby-sum (64 coarse groups, vectorized merge per
    # group) — ~2× faster than Ray's native Sum aggregate on this shape
    def add_hb(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__hb", pa.array(b["__tok"].to_numpy(zero_copy_only=False) % 64,
                             pa.int64()))

    def df_merge(g: pa.Table) -> pa.Table:
        out = (g.select(["__tok", "c"]).group_by("__tok")
               .aggregate([("c", "sum")]).rename_columns(["__tok", "df"]))
        return out.filter(
            pc.greater_equal(out["df"], pa.scalar(hh_min_df, pa.int64())))

    hh_pd = (ds.map_batches(local_df, batch_format="pyarrow")
             .map_batches(add_hb, batch_format="pyarrow")
             .groupby("__hb").map_groups(df_merge, batch_format="pyarrow")
             .to_pandas())
    if "__tok" not in hh_pd.columns:  # no token reached hh_min_df —
        # Ray's all-filtered groupby output is an untyped empty frame
        hh_pd = pd.DataFrame({"__tok": np.array([], np.int64),
                              "df": np.array([], np.int64)})
    hh_toks = hh_pd["__tok"].to_numpy(np.int64)
    hh_order = np.argsort(hh_toks)
    hh_ref = ray.put((hh_toks[hh_order], hh_pd["df"].to_numpy(np.int64)[hh_order]))

    def token_dfs(sh: np.ndarray, toks: np.ndarray, dfs: np.ndarray) -> np.ndarray:
        out = np.ones(len(sh), np.int64)
        if len(toks):
            idx = np.searchsorted(toks, sh)
            idx_c = np.minimum(idx, len(toks) - 1)
            m = toks[idx_c] == sh
            out[m] = dfs[idx_c[m]]
        return out

    def prefix_rows(batch: pa.Table) -> pa.Table:
        toks_s, dfs_s = ray.get(hh_ref)
        texts = batch[col].to_pylist()
        toks, reps, sizes = [], [], []
        for i, s in enumerate(texts):
            sh = masked_shingles(s)
            n = len(sh)
            if n == 0:
                continue
            p = n - int(np.ceil(threshold * n)) + 1
            # ascending (df, hash): rare shingles first — the prefix lemma
            # holds for any consistent order, selectivity needs this one
            sel = np.lexsort((sh, token_dfs(sh, toks_s, dfs_s)))[:p]
            toks.append(sh[sel])
            reps.append(np.full(p, i, np.int64))
            sizes.append(np.full(p, n, np.int64))
        if not toks:
            return pa.table({"__tok": pa.array([], pa.int64()),
                             id_col: batch[id_col].take(pa.array([], pa.int64())),
                             "__n": pa.array([], pa.int64())})
        rep = pa.array(np.concatenate(reps), pa.int64())
        return pa.table({"__tok": pa.array(np.concatenate(toks), pa.int64()),
                         id_col: batch[id_col].take(rep),
                         "__n": pa.array(np.concatenate(sizes), pa.int64())})

    _NBC = max(num_partitions, 32)

    def add_tok_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__b", pa.array(b["__tok"].to_numpy(zero_copy_only=False) % _NBC,
                            pa.int64()))

    buckets = ds.map_batches(prefix_rows, batch_format="pyarrow") \
                .map_batches(add_tok_bucket, batch_format="pyarrow")

    def cand_pairs(group: pa.Table) -> pa.Table:
        # one vectorized self-merge per token hash-bucket — NOT a Python
        # call per token (millions of tiny groups kill map_groups);
        # Arrow-native: the shared capped-pair core + numpy filters
        toks = group["__tok"].to_numpy(zero_copy_only=False)
        ids = np.asarray(group[id_col].to_pylist())
        nn = group["__n"].to_numpy(zero_copy_only=False).astype(np.int64)
        # overflow check on the DEDUPED posting sizes (before the cap):
        # compact id codes keep every composite below 2^63 (63-bit token
        # hashes would overflow a multiplicative pairing)
        _, icode = np.unique(ids, return_inverse=True)
        if len(toks):
            order = np.lexsort((icode, toks))
            ts, is_ = toks[order], icode[order]
            keep = np.ones(len(ts), bool)
            keep[1:] = (ts[1:] != ts[:-1]) | (is_[1:] != is_[:-1])
            _, counts = np.unique(ts[keep], return_counts=True)
            n_over = int((counts > max_docs_per_token).sum())
            if n_over and on_token_overflow == "error":
                raise ValueError(
                    f"ngram_jaccard_dup_pairs: {n_over} prefix token(s) "
                    f"have posting lists over max_docs_per_token="
                    f"{max_docs_per_token} (max {int(counts.max())}); "
                    "truncating would break the recall-1 guarantee — "
                    "raise the cap, lower hh_min_df, or pass "
                    "on_token_overflow='truncate' to accept approximate "
                    "recall")
        a, b_ = _capped_upper_pairs(toks, ids, max_docs_per_token)
        if not len(a):
            return pa.table({"id_a": group[id_col].slice(0, 0),
                             "id_b": group[id_col].slice(0, 0)})
        # size filter: J>=t ⇒ |A∩B| >= t·max ⇒ min(|A|,|B|) >= t·max
        la, lb = nn[a], nn[b_]
        m = np.minimum(la, lb) >= threshold * np.maximum(la, lb)
        a, b_ = a[m], b_[m]
        # pair dedup (the same doc pair arises from several shared
        # tokens); icode is the COMPACT 0..n-1 factorization, so the
        # pairing product stays far below 2^63
        pair_codes = icode[a] * np.int64(icode.max() + 1) + icode[b_]
        _, sel = np.unique(pair_codes, return_index=True)
        return pa.table({"id_a": pa.array(ids[a[sel]]),
                         "id_b": pa.array(ids[b_[sel]])})

    cand = buckets.groupby("__b").map_groups(
        cand_pairs, batch_format="pyarrow").materialize()

    def verified_table(arr_a, arr_b, shingles_of) -> pa.Table:
        """Exact-count verify for one batch of candidate pairs.

        ``shingles_of(id)`` must be cheap on repeat lookups — docs recur
        across many pairs, so each caller wraps masked_shingles in a
        per-batch (or broadcast) id-keyed cache; recomputing per PAIR was
        the original hotspot (~40 s serial on the driver at sf0.1).
        Output id columns are ``take``n from the input Arrow arrays so the
        id type survives empty selections (a pa.array([]) would be null-
        typed and break the block union for string ids).
        """
        ids_a = arr_a.to_pylist()
        ids_b = arr_b.to_pylist()
        n = len(ids_a)
        n_inter = np.empty(n, np.int64)
        n_union = np.empty(n, np.int64)
        for i in range(n):
            sa, sb = shingles_of(ids_a[i]), shingles_of(ids_b[i])
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            n_inter[i] = inter
            n_union[i] = len(sa) + len(sb) - inter
        keep = n_inter >= threshold * n_union
        idx = pa.array(np.nonzero(keep)[0], pa.int64())
        return pa.table({
            "id_a": arr_a.take(idx),
            "id_b": arr_b.take(idx),
            "n_inter": pa.array(n_inter[keep]),
            "n_union": pa.array(n_union[keep]),
        })

    def _typed_empty() -> pa.Table:
        return pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "n_inter": pa.array([], pa.int64()), "n_union": pa.array([], pa.int64()),
        })

    n_cand = cand.count()
    if n_cand == 0:
        # empty map_groups output can be untyped in ray 2.49 — bail before
        # any column-addressed op sees it
        return ray.data.from_arrow(_typed_empty())
    if pair_mode == "auto":
        pair_mode = "broadcast" if n_cand <= _BROADCAST_PAIRS_CAP else "join"
    if pair_mode == "broadcast":
        pairs_pd = cand.to_pandas().drop_duplicates(subset=["id_a", "id_b"])
        if not len(pairs_pd):
            return ray.data.from_arrow(_typed_empty())
        need = np.unique(np.concatenate([pairs_pd["id_a"].to_numpy(),
                                         pairs_pd["id_b"].to_numpy()]))
        need_ref = ray.put(need)

        def pick(b: pa.Table) -> pa.Table:
            mask = np.isin(np.asarray(b[id_col].to_pylist()), ray.get(need_ref))
            sel = b.filter(pa.array(mask))
            return pa.table({id_col: sel[id_col], "__txt": sel[col]})

        got = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
        # verify DISTRIBUTED over pair batches (never a driver loop): texts
        # of candidate docs broadcast once, shingle sets cached per id
        # inside each task
        txt_ref = ray.put(dict(zip(got[id_col], got["__txt"])))

        def verify_batch(b: pa.Table) -> pa.Table:
            txt = ray.get(txt_ref)
            cache: dict = {}

            def shingles_of(i):
                r = cache.get(i)
                if r is None:
                    r = cache[i] = masked_shingles(txt[i])
                return r

            return verified_table(b["id_a"], b["id_b"], shingles_of)

        out = (ray.data.from_pandas(pairs_pd)
               .repartition(num_partitions)
               .map_batches(verify_batch, batch_format="pyarrow"))
        if out.count() == 0:
            return ray.data.from_arrow(_typed_empty())
        return out

    # distributed path: bucketed distinct over id pairs, then two hash
    # joins against the slim (id, text) projection — same shape as
    # embedding_dup_pairs' join mode
    pairs_d = _distinct_pairs(cand, num_partitions)

    def as_side(side: str):
        def prep(b: pa.Table) -> pa.Table:
            return pa.table({f"id_{side}": b[id_col], f"__txt_{side}": b[col]})
        return prep

    txt_a = ds.map_batches(as_side("a"), batch_format="pyarrow")
    txt_b = ds.map_batches(as_side("b"), batch_format="pyarrow")
    witht = (pairs_d.join(txt_a, "inner", num_partitions,
                          on=("id_a",), right_on=("id_a",))
             .repartition(num_partitions)  # inter-join empty-block scrub
             .join(txt_b, "inner", num_partitions,
                   on=("id_b",), right_on=("id_b",)))

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _typed_empty()
        ids_a = b["id_a"].to_pylist()
        ids_b = b["id_b"].to_pylist()
        txt = dict(zip(ids_a, b["__txt_a"].to_pylist()))
        txt.update(zip(ids_b, b["__txt_b"].to_pylist()))
        cache: dict = {}

        def shingles_of(i):
            r = cache.get(i)
            if r is None:
                r = cache[i] = masked_shingles(txt[i])
            return r

        return verified_table(b["id_a"], b["id_b"], shingles_of)

    out = witht.map_batches(verify, batch_format="pyarrow")
    if out.count() == 0:
        return ray.data.from_arrow(_typed_empty())
    return out


def embedding_dup_pairs(ds: ray.data.Dataset, vec_col: str = "embedding",
                        id_col: str = "vec_id", cosine_threshold: float = 0.95,
                        num_planes: int = 8, num_bands: int = 16,
                        max_pairs_per_bucket: int = 10_000,
                        num_partitions: int = 16,
                        pair_mode: str = "auto") -> ray.data.Dataset:
    """Embedding-cosine near-dup: MULTI-BAND random-hyperplane SRP-LSH →
    candidate pairs → join-back cosine verify. Each row explodes into
    ``num_bands`` independent 8-plane sign buckets (like MinHash banding):
    a true pair at cosine c collides in a band with
    p = (1 - acos(c)/pi)^num_planes, so miss probability is (1-p)^num_bands
    — ~1e-6 at c=0.98, ~1% at c=0.95.

    TWO-PHASE SHUFFLE (the 100-TB shape): the bucket stage ships only
    (bucket:int64, id, sketch:int64) rows — the vector payload (×num_bands
    it would otherwise replicate, ~100 KB/row at 768-d float64) never
    rides the band shuffle. The 8-byte sketch is a 64-plane SRP sign code:
    within a bucket, candidate pairs are PREFILTERED by sketch Hamming
    distance (E[hamming] = 64·acos(cos)/π, so a cutoff at +4σ above the
    threshold's expectation passes true pairs w.p. ≈ 1-3e-5 — far below
    the banding miss floor — while killing ~99.97% of the random co-bucket
    pairs that would otherwise explode the candidate set). Survivors get
    their two vectors back for one vectorized cosine verify; ``pair_mode``
    (same auto protocol as :func:`minhash_dedup`) picks how:

    - ``"broadcast"``: the surviving candidate pairs (bounded by the
      per-bucket caps) are collected, the needed vectors come from ONE
      filtered scan of ``ds``, and the verify is a single driver einsum —
      right up to ``_BROADCAST_PAIRS_CAP`` candidates.
    - ``"join"``: fully distributed — candidates are distinct-ed on a
      bucketed hash and the two vectors join back per pair (two hash
      joins against the slim (id, vec) projection). No pair-scaled
      driver state; the 100-TB path.
    - ``"auto"`` (default): broadcast below the cap, join above."""
    import math

    _SKETCH_BITS = 64
    p_thresh = math.acos(min(max(cosine_threshold, -1.0), 1.0)) / math.pi
    sketch_cut = int(np.ceil(
        _SKETCH_BITS * p_thresh
        + 4.0 * math.sqrt(_SKETCH_BITS * p_thresh * (1.0 - p_thresh)))) + 2

    def bucket(batch: pa.Table) -> pa.Table:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()])
        n, d = V.shape
        rng = np.random.default_rng(12345)  # fixed planes — deterministic
        planes = rng.normal(size=(d, num_bands * num_planes + _SKETCH_BITS))
        signs = (V @ planes) > 0  # [n, bands*planes + 64]
        weights = (np.uint64(1) << np.arange(num_planes, dtype=np.uint64))
        keys = np.empty((n, num_bands), dtype=np.int64)
        for band in range(num_bands):
            bits = signs[:, band * num_planes:(band + 1) * num_planes]
            code = (bits.astype(np.uint64) * weights).sum(axis=1)
            # mix the band index in so bands never share buckets
            keys[:, band] = ((code << np.uint64(8)) | np.uint64(band)).astype(np.int64)
        sk_bits = signs[:, num_bands * num_planes:]
        sk_w = (np.uint64(1) << np.arange(_SKETCH_BITS, dtype=np.uint64))
        sketch = (sk_bits.astype(np.uint64) * sk_w).sum(axis=1).view(np.int64)
        ids = batch[id_col]
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), num_bands), pa.int64())
        return pa.table({
            "bucket": pa.array(keys.reshape(-1), pa.int64()),
            id_col: ids.take(rep),
            "__sketch": pa.array(np.repeat(sketch, num_bands), pa.int64()),
        })

    buckets = ds.map_batches(bucket, batch_format="pyarrow")
    # one vectorized self-merge per COARSE bucket instead of one pandas
    # call per raw SRP bucket (~n_rows × num_bands tiny groups otherwise);
    # per-key row cap keeps the merge under the pair cap (skew guard)
    max_rows_per_key = int((1 + np.sqrt(1 + 8 * max_pairs_per_bucket)) // 2)
    _CB = 256

    def coarse(b: pa.Table) -> pa.Table:
        # splitmix-mix the whole key: the raw key's low 8 bits are the
        # BAND INDEX ((code << 8) | band above), so masking them directly
        # yields only num_bands coarse groups — each receiving every row
        # of the dataset once per band (parallelism capped at num_bands,
        # one all-rows pandas task per band). Finalizing first spreads
        # groups across all _CB buckets like the minhash band_key path
        # (whose keys are already splitmix-finalized in band_keys()).
        raw = b["bucket"].to_numpy(zero_copy_only=False).astype(U64)
        cb = (splitmix64(raw) & U64(_CB - 1)).astype(np.int64)
        return b.append_column("__cb", pa.array(cb, pa.int64()))

    def cand_pairs_bulk(group: pa.Table) -> pa.Table:
        keys = group["bucket"].to_numpy(zero_copy_only=False)
        ids = np.asarray(group[id_col].to_pylist())
        a, b_ = _capped_upper_pairs(keys, ids, max_rows_per_key)
        if not len(a):
            return pa.table({"id_a": group[id_col].slice(0, 0),
                             "id_b": group[id_col].slice(0, 0)})
        sk = group["__sketch"].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(U64)
        h = _popcount64_2d(sk[a] ^ sk[b_])
        m = h <= sketch_cut
        return pa.table({"id_a": pa.array(ids[a[m]]),
                         "id_b": pa.array(ids[b_[m]])})

    cand = (buckets.map_batches(coarse, batch_format="pyarrow")
            .groupby("__cb").map_groups(cand_pairs_bulk, batch_format="pyarrow")
            .materialize())
    if pair_mode == "auto":
        pair_mode = ("broadcast" if cand.count() <= _BROADCAST_PAIRS_CAP
                     else "join")
    if pair_mode == "broadcast":
        return _verify_pairs_broadcast(ds, cand, vec_col, id_col,
                                       cosine_threshold)

    # global distinct over (id_a, id_b) — still only id-pair rows shuffle
    pairs_d = _distinct_pairs(cand, num_partitions)

    # join the two vectors back per candidate pair (slim (id, vec) sides);
    # vectors ride as packed float64 bytes — Acero's hash join rejects
    # list-typed payload columns
    def as_side(side: str):
        def prep(b: pa.Table) -> pa.Table:
            packed = [np.asarray(v, np.float64).tobytes()
                      for v in b[vec_col].to_pylist()]
            return pa.table({f"id_{side}": b[id_col],
                             f"__vec_{side}": pa.array(packed, pa.binary())})
        return prep

    vecs_a = ds.map_batches(as_side("a"), batch_format="pyarrow")
    vecs_b = ds.map_batches(as_side("b"), batch_format="pyarrow")
    withv = (pairs_d.join(vecs_a, "inner", num_partitions,
                          on=("id_a",), right_on=("id_a",))
             .repartition(num_partitions)  # inter-join empty-block scrub
             .join(vecs_b, "inner", num_partitions,
                   on=("id_b",), right_on=("id_b",)))

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                             "cosine": pa.array([], pa.float64())})
        Va = np.stack([np.frombuffer(v, np.float64) for v in b["__vec_a"].to_pylist()])
        Vb = np.stack([np.frombuffer(v, np.float64) for v in b["__vec_b"].to_pylist()])
        Va /= np.maximum(np.linalg.norm(Va, axis=1, keepdims=True), 1e-12)
        Vb /= np.maximum(np.linalg.norm(Vb, axis=1, keepdims=True), 1e-12)
        cos = np.einsum("ij,ij->i", Va, Vb)
        keep = np.nonzero(cos >= cosine_threshold)[0]
        return pa.table({
            "id_a": b["id_a"].take(pa.array(keep, pa.int64())),
            "id_b": b["id_b"].take(pa.array(keep, pa.int64())),
            "cosine": pa.array(cos[keep], pa.float64()),
        })

    out = withv.map_batches(verify, batch_format="pyarrow")
    return _ensure_pair_schema(out, "cosine")


def _verify_pairs_broadcast(ds: ray.data.Dataset, cand: ray.data.Dataset,
                            vec_col: str, id_col: str,
                            cosine_threshold: float) -> ray.data.Dataset:
    """Small-candidate-set verify for :func:`embedding_dup_pairs`: dedupe
    the pair list on the driver (bounded by the per-bucket caps), pull
    ONLY the referenced vectors with one filtered scan of ``ds`` (the
    corpus itself never collects), then one vectorized cosine pass."""
    pairs_pd = cand.to_pandas().drop_duplicates(subset=["id_a", "id_b"])
    if not len(pairs_pd):
        return _ensure_pair_schema(cand, "cosine")
    need = np.unique(np.concatenate([pairs_pd["id_a"].to_numpy(),
                                     pairs_pd["id_b"].to_numpy()]))
    need_ref = ray.put(need)

    def pick(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].to_pylist())
        mask = np.isin(ids, ray.get(need_ref))
        sel = b.filter(pa.array(mask))
        packed = [np.asarray(v, np.float64).tobytes()
                  for v in sel[vec_col].to_pylist()]
        return pa.table({id_col: sel[id_col],
                         "__vec": pa.array(packed, pa.binary())})

    got = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    vec = {i: np.frombuffer(v, np.float64)
           for i, v in zip(got[id_col], got["__vec"])}
    Va = np.stack([vec[i] for i in pairs_pd["id_a"]])
    Vb = np.stack([vec[i] for i in pairs_pd["id_b"]])
    Va /= np.maximum(np.linalg.norm(Va, axis=1, keepdims=True), 1e-12)
    Vb /= np.maximum(np.linalg.norm(Vb, axis=1, keepdims=True), 1e-12)
    cos = np.einsum("ij,ij->i", Va, Vb)
    keep = cos >= cosine_threshold
    out = pa.table({
        "id_a": pa.array(pairs_pd["id_a"].to_numpy()[keep]),
        "id_b": pa.array(pairs_pd["id_b"].to_numpy()[keep]),
        "cosine": pa.array(cos[keep], pa.float64()),
    })
    return _ensure_pair_schema(ray.data.from_arrow(out), "cosine")


def _ensure_pair_schema(ds: ray.data.Dataset, value_col: str) -> ray.data.Dataset:
    """An all-empty groupby can yield a schema-less dataset; union a typed
    empty table so consumers always see (id_a, id_b, value_col)."""
    empty = pa.table({
        "id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string()),
        value_col: pa.array([], pa.float64()),
    })
    if ds.count() == 0:
        return ray.data.from_arrow(empty)
    return ds


def dedup_new_against_corpus(new_docs: ray.data.Dataset,
                             corpus: ray.data.Dataset, *,
                             col: str = "text", id_col: str = "doc_id",
                             near: bool = True,
                             jaccard_threshold: float = 0.7,
                             num_perm: int = 64, num_bands: int = 16,
                             shingle_k: int = 5,
                             bloom_bits: int = 1 << 23,
                             num_partitions: int = 16,
                             pair_mode: str = "auto") -> ray.data.Dataset:
    """Incremental ingestion dedup: drop new docs that duplicate the
    EXISTING corpus (the nightly-crawl-vs-100-TB-archive shape). Two
    passes, both cross-only — the archive is never self-joined:

    1. EXACT: Bloom-prefiltered anti join of new content hashes against
       the corpus hashes (``stages/joins.anti_join``). Hash-disjoint new
       docs — the vast majority — never enter the join shuffle; the
       corpus side ships only (hash) key rows.
    2. NEAR (``near=True``): MinHash band keys for the exact survivors
       are probed against the CORPUS band buckets with a semi-join-style
       match (one hash join of slim band rows, new-side ×num_bands rows
       vs corpus ×num_bands rows), candidate (new, old) pairs verified
       by the estimated Jaccard exactly as :func:`lsh_candidate_pairs`.
       No old-old or new-new pairs are ever generated, and ``pair_mode``
       follows the same auto protocol: the verify broadcasts candidate
       texts below ``_BROADCAST_PAIRS_CAP`` pairs and switches to the
       fully distributed join-back-signatures + anti-join plan above it
       (no pair-scaled driver state — a degenerate crawl-vs-archive
       batch degrades to the join, it no longer fails).

    Returns the surviving new docs with their original schema."""
    # ---- pass 1: exact content-hash anti join ----
    from .joins import anti_join

    def with_hash(b: pa.Table) -> pa.Table:
        return add_content_hash(b, col)

    new_h = new_docs.map_batches(with_hash, batch_format="pyarrow")
    corpus_h = (corpus.map_batches(with_hash, batch_format="pyarrow")
                .select_columns(["content_hash"]))
    exact_survivors = anti_join(
        new_h, corpus_h, on=("content_hash",),
        num_partitions=num_partitions,
        bloom_bits=bloom_bits).drop_columns(["content_hash"])
    if not near:
        return exact_survivors

    # ---- pass 2: cross-only LSH near-dup probe ----
    from .joins import drop_empty_blocks

    # the anti-join's hash join emits zero-column blocks for empty
    # partitions; the band_key join below chokes on them — scrub by
    # metadata (free; the dataset materializes here anyway)
    survivors = drop_empty_blocks(exact_survivors.materialize())
    if survivors.count() == 0:
        # every new doc was an exact dup: drop_empty_blocks cannot scrub
        # an ALL-empty dataset (zero-column blocks carry no schema) and
        # the band_key join would crash on it — short-circuit with the
        # typed empty the return contract promises
        from .scan import _typed_empty_like

        return _typed_empty_like(new_docs, {})
    new_bands = minhash_band_rows(survivors, col, id_col, num_perm,
                                  num_bands, shingle_k)
    old_bands = minhash_band_rows(corpus, col, id_col, num_perm,
                                  num_bands, shingle_k)

    def slim(side: str):
        def prep(b: pa.Table) -> pa.Table:
            return pa.table({"band_key": b["band_key"],
                             f"id_{side}": b[id_col],
                             f"__sk0_{side}": b["__sk0"],
                             f"__sk1_{side}": b["__sk1"]})
        return prep

    cut = _sketch_cut(jaccard_threshold, num_perm)
    # one hash join on band_key generates only NEW×OLD co-bucket pairs
    cand = (new_bands.map_batches(slim("a"), batch_format="pyarrow")
            .join(old_bands.map_batches(slim("b"), batch_format="pyarrow"),
                  "inner", num_partitions,
                  on=("band_key",), right_on=("band_key",)))

    def prefilter(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"id_a": b["id_a"], "id_b": b["id_b"]})
        h = (_popcount64_2d(b["__sk0_a"].to_numpy().astype(np.int64).view(U64)
                            ^ b["__sk0_b"].to_numpy().astype(np.int64).view(U64))
             + _popcount64_2d(b["__sk1_a"].to_numpy().astype(np.int64).view(U64)
                              ^ b["__sk1_b"].to_numpy().astype(np.int64).view(U64)))
        keep = pa.array(np.nonzero(h <= cut)[0], pa.int64())
        return pa.table({"id_a": b["id_a"].take(keep),
                         "id_b": b["id_b"].take(keep)})

    pairs = cand.map_batches(prefilter, batch_format="pyarrow").materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return survivors
    if pair_mode == "auto":
        pair_mode = ("broadcast" if n_pairs <= _BROADCAST_PAIRS_CAP
                     else "join")

    def sig_packed(texts: list) -> list[bytes]:
        return [s.tobytes() for s in
                signature_matrix(texts, num_perm=num_perm, k=shingle_k)]

    def est_from_packed(pa_bytes, pb_bytes) -> np.ndarray:
        Sa = np.frombuffer(b"".join(pa_bytes), U64).reshape(-1, num_perm)
        Sb = np.frombuffer(b"".join(pb_bytes), U64).reshape(-1, num_perm)
        return (Sa == Sb).mean(axis=1)

    if pair_mode == "broadcast":
        # verify: recompute the two signatures per distinct candidate pair
        # (broadcast texts of the needed docs — bounded by the candidate
        # set, which the auto switch keeps under the cap)
        pairs_pd = pairs.to_pandas().drop_duplicates(subset=["id_a", "id_b"])
        need_new = ray.put(np.unique(pairs_pd["id_a"].to_numpy()))
        need_old = ray.put(np.unique(pairs_pd["id_b"].to_numpy()))

        def pick(need_ref):
            def f(b: pa.Table) -> pa.Table:
                mask = np.isin(np.asarray(b[id_col].to_pylist()),
                               ray.get(need_ref))
                sel = b.filter(pa.array(mask))
                return pa.table({id_col: sel[id_col], "__txt": sel[col]})
            return f

        got_new = survivors.map_batches(pick(need_new),
                                        batch_format="pyarrow").to_pandas()
        got_old = corpus.map_batches(pick(need_old),
                                     batch_format="pyarrow").to_pandas()
        txt = dict(zip(got_new[id_col], got_new["__txt"]))
        txt.update(zip(got_old[id_col], got_old["__txt"]))
        Sa = signature_matrix([txt[i] for i in pairs_pd["id_a"]],
                              num_perm=num_perm, k=shingle_k)
        Sb = signature_matrix([txt[i] for i in pairs_pd["id_b"]],
                              num_perm=num_perm, k=shingle_k)
        est = (Sa == Sb).mean(axis=1)
        losers = np.unique(pairs_pd["id_a"].to_numpy()[est >= jaccard_threshold])
        if not len(losers):
            return survivors
        losers_ref = ray.put(losers)

        def drop(b: pa.Table) -> pa.Table:
            mask = ~np.isin(np.asarray(b[id_col].to_pylist()),
                            ray.get(losers_ref))
            return b.filter(pa.array(mask))

        return survivors.map_batches(drop, batch_format="pyarrow")

    # join mode — the 100-TB path when the candidate set outgrows the
    # broadcast cap: distinct pairs join back their two packed signatures
    # (new side from the exact survivors, old side from the corpus — the
    # same two-hash-join shape as lsh_candidate_pairs' join mode), losers
    # verify distributed, and an anti join removes them from the
    # survivors. No pair- or corpus-scaled driver state anywhere.
    pairs_d = _distinct_pairs(pairs, num_partitions)

    def as_side(side: str, source_id: str):
        def prep(b: pa.Table) -> pa.Table:
            return pa.table({f"id_{side}": b[source_id],
                             f"__sig_{side}": pa.array(
                                 sig_packed(b[col].to_pylist()), pa.binary())})
        return prep

    sig_a = survivors.map_batches(as_side("a", id_col), batch_format="pyarrow")
    sig_b = corpus.map_batches(as_side("b", id_col), batch_format="pyarrow")
    withs = (pairs_d.join(sig_a, "inner", num_partitions,
                          on=("id_a",), right_on=("id_a",))
             # scrub the zero-column blocks the first join emits for
             # empty partitions before they feed the second join
             # (a join partition fed only those fails — see
             # stages/joins.drop_empty_blocks)
             .repartition(num_partitions)
             .join(sig_b, "inner", num_partitions,
                   on=("id_b",), right_on=("id_b",)))

    def to_losers(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: b["id_a"]})
        est = est_from_packed(b["__sig_a"].to_pylist(), b["__sig_b"].to_pylist())
        keep = pa.array(np.nonzero(est >= jaccard_threshold)[0], pa.int64())
        return pa.table({id_col: b["id_a"].take(keep)})

    losers_ds = withs.map_batches(to_losers, batch_format="pyarrow").materialize()
    if losers_ds.count() == 0:
        return survivors
    return anti_join(survivors, losers_ds, on=(id_col,),
                     num_partitions=num_partitions)


def survivorship(ds: ray.data.Dataset, *, col: str = "text",
                 id_col: str = "doc_id", rank_col: str = "n_chars",
                 out_count: str = "n_dupes") -> ray.data.Dataset:
    """Canonical-record selection (ER survivorship): one row per distinct
    ``col`` content — the row with the highest ``rank_col`` (ties → min
    ``id_col``) — plus the duplicate-group size. SQL shape:
    ``row_number() OVER (PARTITION BY content ORDER BY rank DESC, id)``
    filtered to 1, with ``count(*) OVER`` as the group size.

    Scale shape mirrors :func:`exact_dedup`: the content column never
    shuffles — a per-batch combiner collapses each block to one
    (content_hash, best_id, best_rank, count) row per distinct content,
    and a coarse hash-bucket merge re-applies the same argmax + count-sum
    vectorized over every group in the bucket."""
    _CB = 256

    def partial(b: pa.Table) -> pa.Table:
        t = add_content_hash(b.select([id_col, rank_col, col]), col)
        df = pd.DataFrame({
            "content_hash": t["content_hash"].to_numpy(zero_copy_only=False),
            id_col: t[id_col].to_numpy(zero_copy_only=False),
            rank_col: t[rank_col].to_numpy(zero_copy_only=False),
        })
        df[out_count] = np.ones(len(df), np.int64)
        return pa.Table.from_pandas(_best(df, id_col, rank_col, out_count),
                                    preserve_index=False)

    def _bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__cb", pc.bit_wise_and(b["content_hash"],
                                    pa.scalar(_CB - 1, pa.int64())))

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        out = _best(group.drop(columns="__cb"), id_col, rank_col, out_count)
        return out.drop(columns="content_hash")

    return (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(_bucket, batch_format="pyarrow")
            .groupby("__cb").map_groups(merge, batch_format="pandas"))


def _best(df: pd.DataFrame, id_col: str, rank_col: str,
          out_count: str) -> pd.DataFrame:
    """Vectorized per-group argmax(rank) → min(id) + count sum: one sort
    + drop_duplicates over every content group in the frame."""
    g = df.sort_values(["content_hash", rank_col, id_col],
                       ascending=[True, False, True], kind="mergesort")
    best = g.drop_duplicates(subset=["content_hash"], keep="first").copy()
    cnt = df.groupby("content_hash", sort=False)[out_count].sum()
    best[out_count] = cnt.loc[best["content_hash"]].to_numpy(np.int64)
    return best[["content_hash", id_col, rank_col, out_count]]


def _window_hashes_u64(toks: list, w: int) -> np.ndarray:
    """All w-token window hashes of a token list (uint64, order-sensitive
    polynomial over per-token FNV hashes — w vectorized mult-adds). Token
    hashing goes through the vectorized bulk FNV kernel (bit-identical to
    the scalar twin), not a per-token Python loop."""
    from ..functions.hashing import _fnv1a_bulk

    enc = [t.encode("utf-8") for t in toks]
    data = np.frombuffer(b"".join(enc), dtype=np.uint8)
    offsets = np.zeros(len(enc) + 1, np.int64)
    offsets[1:] = np.cumsum(np.fromiter((len(e) for e in enc),
                                        np.int64, len(enc)))
    ht = _fnv1a_bulk(data, offsets)
    n = len(ht)
    m = n - w + 1
    base = np.uint64(1099511628211)
    acc = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(w):
            acc = acc * base + ht[j:j + m]
    return acc


def containment_pairs(docs: "ray.data.Dataset", *, id_col: str = "doc_id",
                      col: str = "text", w: int = 8,
                      num_partitions: int = 8,
                      broadcast_texts_cap: int = 200_000_000
                      ) -> "ray.data.Dataset":
    """Token-sequence containment dedup → (id_contained, id_container):
    document A whose full token sequence appears verbatim inside B — the
    truncation/quotation near-dup family beside MinHash (partial overlap)
    and exact dedup (full equality).

    Candidate recall is EXACT by the winnowing argument: if A's tokens are
    a contiguous subsequence of B's, every w-token window of A is a window
    of B, so in particular A's MINIMUM window hash appears among B's
    window hashes. The dataflow ships one probe row (min window hash) per
    doc against the full window-hash table — an equi-join on an int64 key,
    never all-pairs — then verifies each candidate with the exact
    token-aligned substring check. Docs with fewer than ``w`` tokens are
    out of scope (a shorter probe window would explode candidate
    multiplicity; the oracle SQL mirrors the same eligibility rule).

    Verify joins candidate pairs against a broadcast id→text map (cap
    ``broadcast_texts_cap`` bytes — beyond it, swap the broadcast for the
    repo's standard two-hash-join text fetch as in dedup_new_against_corpus)."""
    def windows(b: pa.Table) -> pa.Table:
        # ids keep their native type (string or int — same contract as
        # the sibling dedup operators)
        ids_out, hs_out, probe = [], [], []
        for did, text in zip(b[id_col].to_pylist(), b[col].to_pylist()):
            toks = text.split(" ") if text else []
            if len(toks) < w:
                continue
            hw = _window_hashes_u64(toks, w)
            hi = (hw & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
            uniq = np.unique(hi)
            ids_out.append([did] * len(uniq))
            hs_out.append(uniq)
            probe.append(int(hi.min()))
        if not ids_out:
            return pa.table({"id": b[id_col].slice(0, 0),
                             "h": pa.array([], pa.int64()),
                             "is_probe": pa.array([], pa.bool_())})
        ids_flat = pa.array([d for sub in ids_out for d in sub],
                            type=b[id_col].type)
        hs_np = np.concatenate(hs_out)
        prb = np.zeros(len(hs_np), dtype=bool)
        # the probe hash is each doc's min window hash — mark one row per doc
        off = 0
        for k, arr in enumerate(hs_out):
            prb[off + int(np.searchsorted(arr, probe[k]))] = True
            off += len(arr)
        return pa.table({"id": ids_flat, "h": pa.array(hs_np),
                         "is_probe": pa.array(prb)})

    win = docs.map_batches(windows, batch_format="pyarrow").materialize()
    probes = (win.filter(expr="is_probe == True")
              .select_columns(["id", "h"])
              .rename_columns({"id": "id_contained"}))
    table = (win.select_columns(["id", "h"])
             .rename_columns({"id": "id_container"}))
    cand = probes.join(table, "inner", num_partitions,
                       on=("h",), right_on=("h",))

    def distinct_pairs(b: pa.Table) -> pa.Table:
        t = b.select(["id_contained", "id_container"])
        t = t.filter(pc.not_equal(t["id_contained"], t["id_container"]))
        return t.group_by(["id_contained", "id_container"]).aggregate([])

    cand = (cand.map_batches(distinct_pairs, batch_format="pyarrow")
            .groupby(["id_contained", "id_container"])
            .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
            .materialize())

    id_type = win.schema().base_schema.field("id").type
    if cand.count() == 0:  # no candidates → never touch the corpus text
        return ray.data.from_arrow(pa.table({
            "id_contained": pa.array([], id_type),
            "id_container": pa.array([], id_type)}))

    # verify texts are bounded by the CANDIDATE id set (2×|cand| ids),
    # not the whole corpus — only those docs' texts reach the driver
    need: set = set()
    for b in cand.iter_batches(batch_format="pyarrow"):
        need.update(b["id_contained"].to_pylist())
        need.update(b["id_container"].to_pylist())
    texts: dict = {}
    total = 0
    for b in docs.iter_batches(batch_format="pyarrow"):
        for did, tx in zip(b[id_col].to_pylist(), b[col].to_pylist()):
            if did in need:
                texts[did] = tx
                total += len(tx)
    if total > broadcast_texts_cap:  # pragma: no cover - scale path
        raise NotImplementedError(
            "candidate texts exceed the broadcast cap; wire the "
            "two-hash-join text fetch (see dedup_new_against_corpus) "
            "for this size")
    texts_ref = ray.put(texts)

    def verify(b: pa.Table) -> pa.Table:
        tmap = ray.get(texts_ref)
        keep = []
        for a_, b__ in zip(b["id_contained"].to_pylist(),
                           b["id_container"].to_pylist()):
            ta, tb = tmap.get(a_), tmap.get(b__)
            keep.append(ta is not None and tb is not None
                        and (" " + ta + " ") in (" " + tb + " "))
        return b.filter(pa.array(keep))

    return cand.map_batches(verify, batch_format="pyarrow")


def semdedup_pairs(ds: "ray.data.Dataset", *, k: int = 16, iters: int = 3,
                   cosine_threshold: float = 0.42,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   centroids: "np.ndarray | None" = None,
                   max_cluster_size: int = 100_000,
                   row_tile: int = 2048) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) candidate stage →
    (id_a, id_b, cid): semantic near-duplicate pairs found by k-means
    clustering the embedding space and comparing cosine similarity ONLY
    within each cluster — the all-pairs n² matrix is never formed; total
    work is Σ c_i² over cluster sizes, and k is the knob that bounds it
    (pick k ≈ n / target_cluster_size at scale).

    This is the IVF-shaped scale path beside the SRP-LSH one
    (:func:`embedding_dup_pairs`): LSH bounds work probabilistically per
    band; SemDeDup bounds it structurally per centroid, and additionally
    yields the cluster id — the unit the paper dedups within.

    Determinism (what makes the output pinnable as a VALUES oracle):
    training is the exact int64 fixed-point k-means
    (:func:`~entity_linking_ray.stages.knn.kmeans_fit_actors`,
    bit-reproducible across partitionings), assignment is argmax cosine
    with ties to the lowest centroid index, and each cluster's rows are
    sorted by id before the pairwise pass so every pair's dot product is
    computed from identical operands in identical order no matter how
    blocks were split. Pairs are emitted with ``id_a < id_b``.

    Memory: the within-cluster pass is row-tiled (``row_tile`` × c floats
    live at once, never c²); clusters beyond ``max_cluster_size`` raise
    with guidance (raise k) rather than silently degrade — same loud-cap
    policy as the LSH/broadcast families."""
    from .knn import _normalize, _to_matrix, kmeans_fit_actors

    if centroids is None:
        centroids = kmeans_fit_actors(ds, k=k, iters=iters,
                                      vec_col=vec_col, id_col=id_col)
    Cn = _normalize(np.asarray(centroids, dtype=np.float64))
    c_ref = ray.put(Cn)

    def assign(b: pa.Table) -> pa.Table:
        Vn = _normalize(_to_matrix(b[vec_col].to_pylist()))
        cid = np.argmax(Vn @ ray.get(c_ref).T, axis=1)  # ties -> lowest
        packed = [row.tobytes() for row in Vn]
        return pa.table({
            "cid": pa.array(cid.astype(np.int64), pa.int64()),
            id_col: b[id_col],
            "__vec": pa.array(packed, pa.binary()),
        })

    def pairs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "cid": pa.array([], pa.int64())})
        if n < 2:
            return empty
        if n > max_cluster_size:  # pragma: no cover - scale guard
            raise ValueError(
                f"semdedup cluster of {n} rows exceeds max_cluster_size="
                f"{max_cluster_size}; raise k (target c ~ n/k) or the cap")
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.frombuffer(
            b"".join(g["__vec"].take(pa.array(order)).to_pylist()),
            np.float64).reshape(n, -1)
        cid = int(g["cid"][0].as_py())
        out_a, out_b = [], []
        for lo in range(0, n, row_tile):
            hi = min(lo + row_tile, n)
            C = V[lo:hi] @ V.T  # (tile, n)
            ti, tj = np.nonzero(C >= cosine_threshold)
            m = (ti + lo) < tj  # strict upper triangle in global coords
            out_a.append(ids[ti[m] + lo])
            out_b.append(ids[tj[m]])
        a = np.concatenate(out_a) if out_a else np.array([], np.int64)
        b_ = np.concatenate(out_b) if out_b else np.array([], np.int64)
        if not len(a):
            return empty
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(b_, pa.int64()),
                         "cid": pa.array(np.full(len(a), cid), pa.int64())})

    # Materialize the pair list: it is slim (3 int64 columns, bounded by
    # the near-dup pair count, not n) and every consumer branches on it —
    # without this the empty-check count() plus each downstream read
    # would re-run k-means + assign + the pairwise pass from scratch.
    out = (ds.map_batches(assign, batch_format="pyarrow")
             .groupby("cid").map_groups(pairs, batch_format="pyarrow")
             .materialize())
    if out.count() == 0:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cid": pa.array([], pa.int64())}))
    return out


def semdedup(ds: "ray.data.Dataset", *, k: int = 16, iters: int = 3,
             cosine_threshold: float = 0.42, vec_col: str = "embedding",
             id_col: str = "vec_id", winner_mode: str = "auto",
             num_partitions: int = 16) -> "ray.data.Dataset":
    """SemDeDup keep-set: rows of ``ds`` that survive semantic dedup.
    Pairs from :func:`semdedup_pairs` feed the repo's standard winner
    machinery — connected components over the pair graph, min-id winner
    per component, losers removed — with the same ``winner_mode``
    dispatch as :func:`minhash_dedup` (equivalence-tested):

    - ``"broadcast"``: loser set collected once on the driver
      (O(|dup pairs|) memory) and applied as a single filter pass — no
      joins; right up to ``_BROADCAST_PAIRS_CAP`` pairs.
    - ``"join"``: fully distributed anti join; no pair-scaled driver
      state — the 100-TB path. The vector column rides the joins packed
      as fixed-width binary: Acero hash joins reject ``list<float>``
      non-key payloads (ArrowInvalid), and the pack/unpack pair is two
      zero-loss vectorized passes either side of the join.
    - ``"auto"`` (default): broadcast below the cap, join above.
    """
    pairs = semdedup_pairs(ds, k=k, iters=iters,
                           cosine_threshold=cosine_threshold,
                           vec_col=vec_col, id_col=id_col)
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ds
    if winner_mode == "auto":
        winner_mode = "broadcast" if n_pairs <= _BROADCAST_PAIRS_CAP else "join"
    if winner_mode == "broadcast":
        return _drop_losers_broadcast(ds, pairs, id_col)

    # pack/unpack round-trips the column's OWN value dtype and list type,
    # so join mode emits byte-identical vectors to broadcast mode (a
    # fixed float32 pack would silently truncate float64 corpora and
    # make the output schema depend on which mode the pair count picked)
    vec_type = ds.schema().base_schema.field(vec_col).type
    np_dt = np.float32 if pa.types.is_float32(vec_type.value_type) \
        else np.float64

    def pack(b: pa.Table) -> pa.Table:
        vals = [np.asarray(v, np_dt).tobytes()
                for v in b[vec_col].to_pylist()]
        i = b.schema.get_field_index(vec_col)
        return b.set_column(i, vec_col, pa.array(vals, pa.binary()))

    def unpack(b: pa.Table) -> pa.Table:
        vals = [np.frombuffer(v, np_dt) for v in b[vec_col].to_pylist()]
        i = b.schema.get_field_index(vec_col)
        return b.set_column(i, vec_col, pa.array(vals, vec_type))

    kept = _drop_losers_keyed(ds.map_batches(pack, batch_format="pyarrow"),
                              pairs.drop_columns(["cid"]), id_col,
                              num_partitions=num_partitions)
    return kept.map_batches(unpack, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Line-level boilerplate dedup (CCNet/C4-style): a line duplicated across
# the corpus is removed from EVERY document that carries it.

_LINE_BROADCAST_CAP = 2_000_000  # duplicated-line strings held driver-side


def duplicated_lines(ds: ray.data.Dataset, col: str = "text",
                     min_count: int = 2) -> ray.data.Dataset:
    """Corpus-wide duplicated-line table (line, n) with n >= min_count.

    Combiner-shaped: each batch pre-counts its own lines (one Arrow
    group_by per batch), so the shuffle carries at most one row per
    DISTINCT line per block — never one row per occurrence. The merge
    groupby runs over a coarse 256-way hash bucket with a vectorized
    per-bucket Arrow aggregate (the exact_dedup pattern; a per-line Ray
    group would make every distinct line its own Python group)."""
    _CB = 256

    def partial(b: pa.Table) -> pa.Table:
        lines = pc.list_flatten(
            pc.split_pattern(b[col].combine_chunks(), "\n"))
        part = (pa.table({"line": lines}).group_by("line")
                .aggregate([("line", "count")])
                .rename_columns(["line", "n"]))
        cb = hash_strings_arrow(part["line"]) % _CB
        return part.append_column("__cb", pa.array(cb, pa.int64()))

    def merge(group: pa.Table) -> pa.Table:
        full = (group.group_by("line").aggregate([("n", "sum")])
                .rename_columns(["line", "n"]))
        return full.filter(pc.greater_equal(full["n"],
                                            pa.scalar(min_count, pa.int64())))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__cb").map_groups(merge, batch_format="pyarrow"))


def _line_scrub_table(b: pa.Table, col: str, id_col: str,
                      is_dup) -> pa.Table:
    """Vectorized per-batch line scrub: split -> flag -> rebuild -> join.
    ``is_dup(flat_lines: np.ndarray) -> bool mask`` abstracts the
    membership test (broadcast searchsorted vs join-marked column)."""
    split = pc.split_pattern(b[col].combine_chunks(), "\n")
    flat = pc.list_flatten(split)
    lens = np.diff(split.offsets.to_numpy())
    keep = ~is_dup(flat.to_numpy(zero_copy_only=False))
    row = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
    kept_per_row = np.bincount(row[keep], minlength=b.num_rows)
    new_off = np.concatenate(
        [[0], np.cumsum(kept_per_row)]).astype(np.int64)
    kept_lists = pa.ListArray.from_arrays(
        pa.array(new_off.astype(np.int32), pa.int32()),
        flat.filter(pa.array(keep)))
    return pa.table({
        id_col: b[id_col],
        "kept_lines": pa.array(kept_per_row.astype(np.int64), pa.int64()),
        "dropped_lines": pa.array((lens - kept_per_row).astype(np.int64),
                                  pa.int64()),
        "clean_text": pc.binary_join(kept_lists, "\n"),
    })


def line_dedup(ds: ray.data.Dataset, col: str = "text",
               id_col: str = "doc_id", min_count: int = 2,
               mode: str = "auto",
               num_partitions: int = 16) -> ray.data.Dataset:
    """Remove every occurrence of any line whose corpus-wide occurrence
    count is >= ``min_count`` (the CCNet/C4 boilerplate scrub — headers,
    footers, nav text). Output: one row per input row —
    (id, kept_lines, dropped_lines, clean_text), clean_text preserving
    the original order of the surviving lines ('' if none survive).

    Engine extension beyond the reference (its dedup is whole-alias
    ``set()`` only, SURVEY.md §2.7 D1); the operator the reference's
    corpus prep would need first at web scale.

    Two equivalence-tested paths, dispatched on the duplicated-line
    count (the minhash_dedup winner-dispatch pattern):

    - broadcast (<= _LINE_BROADCAST_CAP dup lines): the dup set is
      ray.put once, each batch scrubs via one sorted-array searchsorted
      — no second shuffle of document text.
    - join (scale path): documents explode to (row hash of id, ord,
      line) WITHOUT carrying text bodies, left-join the dup table on
      line, and a coarse-bucketed vectorized reassembly rebuilds
      clean_text — document text crosses the wire once, as its lines.
    """
    dup = duplicated_lines(ds, col, min_count).materialize()
    n_dup = dup.count()

    if mode == "auto":
        mode = "broadcast" if n_dup <= _LINE_BROADCAST_CAP else "join"

    def _typed_empty_seed(out: ray.data.Dataset) -> ray.data.Dataset:
        # the repo's pinned "typed empty out for empty in" contract
        # (windows._union_typed_empty): empty input otherwise yields zero
        # blocks with schema() None, breaking downstream unions
        in_schema = ds.schema()
        id_type = (dict(zip(in_schema.names, in_schema.types))
                   .get(id_col, pa.string())
                   if in_schema is not None else pa.string())
        return out.union(ray.data.from_arrow(pa.table({
            id_col: pa.array([], id_type),
            "kept_lines": pa.array([], pa.int64()),
            "dropped_lines": pa.array([], pa.int64()),
            "clean_text": pa.array([], pa.string()),
        })))

    if mode == "broadcast":
        dup_sorted = np.sort(np.asarray(
            [s for b in dup.iter_batches(batch_format="pyarrow")
             for s in b["line"].to_pylist()], dtype=object)) \
            if n_dup else np.empty(0, object)
        dup_ref = ray.put(dup_sorted)

        def scrub(b: pa.Table) -> pa.Table:
            d = ray.get(dup_ref)

            def is_dup(flat: np.ndarray) -> np.ndarray:
                if not len(d) or not len(flat):
                    return np.zeros(len(flat), bool)
                idx = np.searchsorted(d, flat)
                ok = idx < len(d)
                ok[ok] = d[idx[ok]] == flat[ok]
                return ok

            return _line_scrub_table(b, col, id_col, is_dup)

        return _typed_empty_seed(
            ds.map_batches(scrub, batch_format="pyarrow"))

    # ---- join path: explode lines, mark dups, reassemble per doc ----
    _NB = 64

    def explode(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b[col].combine_chunks(), "\n")
        flat = pc.list_flatten(split)
        lens = np.diff(split.offsets.to_numpy())
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        ord_ = (np.arange(len(flat), dtype=np.int64)
                - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]),
                            lens))
        ids = b[id_col].take(pa.array(row, pa.int64()))
        return pa.table({id_col: ids,
                         "__ord": pa.array(ord_, pa.int64()),
                         "line": flat})

    marked = (ds.select_columns([id_col, col])
              .map_batches(explode, batch_format="pyarrow")
              .join(dup.map_batches(
                  lambda t: pa.table({
                      "line": t["line"],
                      "__dup": pa.array(np.ones(t.num_rows, np.int8))}),
                  batch_format="pyarrow").repartition(num_partitions),
                  "left_outer", num_partitions,
                  on=("line",), right_on=("line",)))

    def bucket(b: pa.Table) -> pa.Table:
        if pa.types.is_integer(b[id_col].type):
            k = splitmix64(b[id_col].to_numpy(zero_copy_only=False)
                           .astype(np.uint64)).astype(np.int64) % _NB
        else:
            k = hash_strings([str(x) for x in b[id_col].to_pylist()]) % _NB
        return b.append_column("__db", pa.array(k, pa.int64()))

    def reassemble(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        _, codes = np.unique(ids, return_inverse=True)
        order = np.lexsort((g["__ord"].to_numpy(zero_copy_only=False),
                            codes))
        s = g.take(pa.array(order, pa.int64()))
        codes = codes[order]
        lens = np.bincount(codes)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        keep = pc.is_null(s["__dup"]).to_numpy(zero_copy_only=False)
        kept_per_row = np.bincount(codes[keep], minlength=len(lens))
        new_off = np.concatenate([[0], np.cumsum(kept_per_row)])
        kept_lists = pa.ListArray.from_arrays(
            pa.array(new_off.astype(np.int32), pa.int32()),
            s["line"].combine_chunks().filter(pa.array(keep)))
        return pa.table({
            id_col: s[id_col].take(pa.array(starts, pa.int64())),
            "kept_lines": pa.array(kept_per_row.astype(np.int64)),
            "dropped_lines": pa.array((lens - kept_per_row).astype(np.int64)),
            "clean_text": pc.binary_join(kept_lists, "\n"),
        })

    return _typed_empty_seed(
        marked.map_batches(bucket, batch_format="pyarrow")
        .groupby("__db").map_groups(reassemble, batch_format="pyarrow"))


_SUBSTR_BROADCAST_CAP = 50_000_000  # dup window hashes driver-side (400 MB)
_SUBSTR_BASE = np.uint64(1_000_003)


def _window_char_hashes(texts: list, w: int) -> tuple[np.ndarray,
                                                      np.ndarray,
                                                      np.ndarray]:
    """All w-CHAR window hashes for a batch of texts in ONE vectorized
    rolling pass: codepoints concatenate into a single uint64 array
    (w-1 sentinels between docs so no window spans two docs), the
    polynomial hash h = Σ c·Bʲ accumulates in w vectorized steps
    (uint64 wraparound ≡ mod 2⁶⁴, masked to the repo's 63-bit int64
    groupby-key domain), and per-doc window starts gather by index —
    no per-character Python. → (doc_row, pos, hash63); ``pos`` is the
    0-based CHARACTER offset (DuckDB substr parity for any script,
    not just ASCII)."""
    if any(t is None for t in texts):
        raise ValueError("dup_substring_spans: null text not supported")
    cps = [np.frombuffer(t.encode("utf-32-le"), np.uint32) for t in texts]
    lens = np.array([len(c) for c in cps], np.int64)
    n_win = np.maximum(lens - w + 1, 0)
    if not n_win.sum():
        z = np.empty(0, np.int64)
        return z, z, z
    sep = np.full(w - 1, 0x110000, np.uint32)  # above any codepoint
    glued: list[np.ndarray] = []
    for c in cps:
        glued.append(c)
        glued.append(sep)
    cat = np.concatenate(glued[:-1]).astype(np.uint64)
    m = len(cat) - w + 1
    h = np.zeros(m, np.uint64)
    for j in range(w):
        h = h * _SUBSTR_BASE + cat[j:j + m]
    # valid window starts: doc i occupies [off, off+len) in the glue
    off = np.concatenate([[0], np.cumsum(lens + (w - 1))[:-1]])
    pos = _win_pos(n_win)
    starts = np.repeat(off, n_win) + pos
    doc_row = np.repeat(np.arange(len(texts), dtype=np.int64), n_win)
    return doc_row, pos, (h[starts] & np.uint64((1 << 63) - 1)).astype(
        np.int64)


def _win_pos(n_win: np.ndarray) -> np.ndarray:
    """[0..n_win[0]), [0..n_win[1]), ... concatenated (segment arange)."""
    total = int(n_win.sum())
    if not total:
        return np.empty(0, np.int64)
    seg_start = np.concatenate([[0], np.cumsum(n_win)[:-1]])
    return (np.arange(total, dtype=np.int64)
            - np.repeat(seg_start, n_win))


def _merge_window_spans(doc_row: np.ndarray, pos: np.ndarray,
                        w: int) -> tuple[np.ndarray, np.ndarray,
                                         np.ndarray]:
    """Merge hit windows [pos, pos+w) into maximal spans per doc (rows
    arrive (doc_row, pos)-sorted from generation order). Adjacent or
    overlapping windows fuse; a break needs a gap: pos - prev > w.
    → (doc_row, span_start, span_end) per island, vectorized."""
    if not len(pos):
        z = np.empty(0, np.int64)
        return z, z, z
    brk = np.ones(len(pos), bool)
    brk[1:] = (doc_row[1:] != doc_row[:-1]) | (pos[1:] - pos[:-1] > w)
    istart = np.nonzero(brk)[0]
    iend = np.append(istart[1:], len(pos)) - 1
    return doc_row[istart], pos[istart], pos[iend] + w


def dup_substring_spans(ds: ray.data.Dataset, *, window: int = 40,
                        min_count: int = 2, col: str = "text",
                        id_col: str = "doc_id", mode: str = "auto",
                        num_partitions: int = 16) -> ray.data.Dataset:
    """Exact duplicate-substring span detection (the ExactSubstr corpus
    scrub of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", §4.1 — suffix-array semantics re-expressed
    as a window-hash dataflow): → (id_col, span_start, span_end), the
    maximal character spans covered by at least one ``window``-char
    substring whose corpus-wide occurrence count (in-doc repeats
    included) is >= ``min_count``. 0-based, end-exclusive.

    Engine extension beyond the reference (SURVEY.md §2.7 has only
    whole-alias exact dedup); with line_dedup this completes the
    line/substring boilerplate-scrub pair a 100-TB corpus prep needs.

    Dataflow (never an all-pairs or full-text shuffle):

    1. count: one map pass rolls every window hash per block and
       pre-counts distinct hashes (np.unique combiner) — the shuffle
       carries one (hash, n) row per distinct hash per block; a coarse
       256-bucket groupby sums and keeps n >= min_count. Duplicated
       windows are the small output (dup-rate × corpus).
    2. mark: broadcast (<= _SUBSTR_BROADCAST_CAP dup hashes) ships the
       sorted dup array once and each block re-rolls + searchsorted-
       probes its own windows WHERE THEY ARE — document text crosses
       the wire zero extra times; past the cap, slim (key, pos) rows
       for ALL windows semi-join the dup table instead (text still
       never re-ships), then a keyed co-group rebuilds per-doc order.
    3. merge: hit windows fuse into maximal spans (gap > window breaks)
       in one vectorized kernel.

    Hash collisions can only over-mark, with probability ~2^-63 per
    window pair (the decontam/minhash precedent); the DuckDB oracle
    compares exact substrings."""
    _CB = 256

    def count_partial(b: pa.Table) -> pa.Table:
        _, _, h = _window_char_hashes(b[col].to_pylist(), window)
        u, n = np.unique(h, return_counts=True)
        return pa.table({
            "__h": pa.array(u, pa.int64()),
            "__n": pa.array(n.astype(np.int64)),
            "__cb": pa.array(u % _CB, pa.int64()),
        })

    def count_merge(g: pa.Table) -> pa.Table:
        full = (g.group_by("__h").aggregate([("__n", "sum")])
                .rename_columns(["__h", "__n"]))
        return full.filter(pc.greater_equal(
            full["__n"], pa.scalar(min_count, pa.int64()))).select(["__h"])

    dup = (ds.map_batches(count_partial, batch_format="pyarrow")
           .groupby("__cb").map_groups(count_merge, batch_format="pyarrow")
           .materialize())
    n_dup = dup.count()
    if mode == "auto":
        mode = "broadcast" if n_dup <= _SUBSTR_BROADCAST_CAP else "join"

    in_schema = ds.schema()
    id_type = (dict(zip(in_schema.names, in_schema.types))
               .get(id_col, pa.string())
               if in_schema is not None else pa.string())
    empty = pa.table({id_col: pa.array([], id_type),
                      "span_start": pa.array([], pa.int64()),
                      "span_end": pa.array([], pa.int64())})

    if mode == "broadcast":
        parts = [b["__h"].to_numpy(zero_copy_only=False)
                 for b in dup.iter_batches(batch_format="pyarrow")]
        probe = (np.sort(np.concatenate(parts)) if parts
                 else np.empty(0, np.int64))
        probe_ref = ray.put(probe)

        def mark(b: pa.Table) -> pa.Table:
            p = ray.get(probe_ref)
            doc_row, pos, h = _window_char_hashes(b[col].to_pylist(),
                                                  window)
            if not len(h) or not len(p):
                return empty
            at = np.searchsorted(p, h)
            hit = p[np.minimum(at, len(p) - 1)] == h
            dr, ss, se = _merge_window_spans(doc_row[hit], pos[hit],
                                             window)
            return pa.table({
                id_col: b[id_col].take(pa.array(dr, pa.int64())),
                "span_start": pa.array(ss),
                "span_end": pa.array(se),
            })

        out = ds.map_batches(mark, batch_format="pyarrow")
        return out.union(ray.data.from_arrow(empty))

    # join plan: slim (id, pos, hash) window rows semi-join the dup
    # hashes, then a coarse keyed co-group re-sorts each doc's hits and
    # merges spans — document text never re-ships
    from .joins import semi_join

    def explode(b: pa.Table) -> pa.Table:
        doc_row, pos, h = _window_char_hashes(b[col].to_pylist(), window)
        return pa.table({
            id_col: b[id_col].take(pa.array(doc_row, pa.int64())),
            "__p": pa.array(pos),
            "__h": pa.array(h),
        })

    wins = ds.map_batches(explode, batch_format="pyarrow")
    hits = semi_join(wins, dup.repartition(num_partitions),
                     on=("__h",), num_partitions=num_partitions)

    def bucket(b: pa.Table) -> pa.Table:
        if pa.types.is_integer(b[id_col].type):
            k = (b[id_col].to_numpy(zero_copy_only=False)
                 .astype(np.uint64))
            cb = (splitmix64(k) % np.uint64(_CB)).astype(np.int64)
        else:
            cb = hash_strings_arrow(b[id_col]) % _CB
        return pa.table({id_col: b[id_col], "__p": b["__p"],
                         "__cb": pa.array(cb, pa.int64())})

    def merge_spans(g: pa.Table) -> pa.Table:
        ids = g[id_col]
        pos = g["__p"].to_numpy(zero_copy_only=False)
        # stable per-doc ordering: sort by (id, pos) via a dense rank of
        # the id column (works for string and int ids alike)
        codes = pc.dictionary_encode(ids.combine_chunks()).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((pos, codes))
        dr, ss, se = _merge_window_spans(codes[o], pos[o], window)
        idx = np.empty(len(codes), np.int64)  # first row index per code
        idx[codes[o][::-1]] = o[::-1]
        return pa.table({
            id_col: ids.take(pa.array(idx[dr], pa.int64())),
            "span_start": pa.array(ss),
            "span_end": pa.array(se),
        })

    out = (hits.map_batches(bucket, batch_format="pyarrow")
           .groupby("__cb").map_groups(merge_spans,
                                       batch_format="pyarrow"))
    return out.union(ray.data.from_arrow(empty))
