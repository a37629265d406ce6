"""Benchmark decontamination: flag training documents that share any
k-word shingle with a held-out evaluation set.

The training-data-pipeline shape (n-gram overlap decontamination à la
GPT-3 appendix C / Gopher §A.5): the eval set is small (thousands of
docs), the training corpus is the 100-TB side. Accordingly the eval
grams build ONCE into a broadcast probe structure and the training side
streams through one map pass — the corpus never shuffles.

Two plans, auto-selected by eval-gram count (the same size-gated
protocol as ``stages/dedup.minhash_dedup``):

- ``"broadcast"``: distinct eval gram hashes collect into one sorted
  int64 array (8 bytes/gram — 10^8 grams ≈ 800 MB, the practical cap),
  ``ray.put`` once; each training batch probes via ``np.searchsorted``
  over its concatenated gram hashes (one vectorized call per batch).
- ``"join"``: training (gram, doc_id) rows semi-join the distinct eval
  gram rows — no driver-scaled state, for eval sets beyond the
  broadcast cap.

Gram hashing is ``functions.minhash.word_shingle_hashes`` on BOTH sides
(63-bit rolling hash over cached per-word hashes); a hash collision can
only over-flag (~2^-63 per doc-gram pair — negligible).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.minhash import word_shingle_hashes

_BROADCAST_GRAMS_CAP = 100_000_000


def _gram_rows(ds: ray.data.Dataset, col: str, id_col: str,
               ngram: int) -> ray.data.Dataset:
    """(id, gram-hash) rows, grams deduplicated per document."""
    def explode(b: pa.Table) -> pa.Table:
        texts = b[col].to_pylist()
        grams = [word_shingle_hashes(t, ngram) for t in texts]
        lens = np.array([len(g) for g in grams], np.int64)
        rep = pa.array(np.repeat(np.arange(len(texts), dtype=np.int64), lens),
                       pa.int64())
        flat = (np.concatenate(grams) if lens.sum()
                else np.empty(0, np.int64))
        return pa.table({id_col: b[id_col].take(rep),
                         "__g": pa.array(flat, pa.int64())})

    return ds.map_batches(explode, batch_format="pyarrow")


def contaminated_doc_ids(train: ray.data.Dataset, test: ray.data.Dataset, *,
                         col: str = "text", id_col: str = "doc_id",
                         ngram: int = 4,
                         num_partitions: int = 16,
                         mode: str = "auto") -> ray.data.Dataset:
    """→ distinct (id_col) of training docs sharing >= 1 ``ngram``-word
    shingle with any test doc. See the module docstring for the two
    plans; ``mode`` in {"auto", "broadcast", "join"}."""
    if mode == "auto":
        # distinct eval grams counted with one combiner pass — the eval
        # side is assumed small; only its distinct gram count decides
        test_grams = _gram_rows(test, col, id_col, ngram)
        uniq = test_grams.map_batches(
            lambda b: pa.table({"__g": b["__g"].combine_chunks().unique()}),
            batch_format="pyarrow").materialize()
        mode = ("broadcast" if uniq.count() <= _BROADCAST_GRAMS_CAP
                else "join")
    else:
        uniq = _gram_rows(test, col, id_col, ngram).map_batches(
            lambda b: pa.table({"__g": b["__g"].combine_chunks().unique()}),
            batch_format="pyarrow").materialize()

    if mode == "broadcast":
        parts = [b["__g"].to_numpy(zero_copy_only=False)
                 for b in uniq.iter_batches(batch_format="pyarrow")]
        probe = (np.unique(np.concatenate(parts)) if parts
                 else np.empty(0, np.int64))
        probe_ref = ray.put(probe)

        def flag(b: pa.Table) -> pa.Table:
            p = ray.get(probe_ref)
            texts = b[col].to_pylist()
            if not len(p) or not texts:
                return pa.table({id_col: b[id_col].slice(0, 0)})
            grams = [word_shingle_hashes(t, ngram) for t in texts]
            lens = np.array([len(g) for g in grams], np.int64)
            if not lens.sum():
                return pa.table({id_col: b[id_col].slice(0, 0)})
            flat = np.concatenate(grams)
            pos = np.searchsorted(p, flat)
            hit = p[np.minimum(pos, len(p) - 1)] == flat
            seg = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
            doc_hit = np.zeros(len(texts), bool)
            np.logical_or.at(doc_hit, seg, hit)
            keep = pa.array(np.nonzero(doc_hit)[0], pa.int64())
            return pa.table({id_col: b[id_col].take(keep)})

        return train.map_batches(flag, batch_format="pyarrow")

    # join mode: training gram rows semi-join the distinct eval grams,
    # then distinct doc ids — no driver-scaled state
    from .joins import _distinct_keys, semi_join

    train_grams = _gram_rows(train, col, id_col, ngram)
    hits = semi_join(train_grams, uniq.repartition(num_partitions),
                     on=("__g",), num_partitions=num_partitions)
    return _distinct_keys(hits, (id_col,), num_partitions)
