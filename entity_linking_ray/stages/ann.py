"""Approximate-nearest-neighbor candidate retrieval (dense path).

Reference: bi-encoder top-k via an in-process matmul
(``biencoder_.py:147-167``) or a single-shard FAISS index
(``indexer/faiss_indexer.py:47-141``, queried at ``main_dense.py:245-248``).
Two Ray-native forms, same contract (query matrix → top-k ids + scores,
tie-break score desc / entity_id asc):

- :class:`BroadcastIndex` — the entity embedding matrix is ``ray.put``
  once; every map_batches actor reads it zero-copy and does a local
  matmul + argpartition. Right for KBs that fit worker RAM (reference's
  own operating point).
- :class:`IndexShard` actors + :func:`sharded_topk` — entities hash-
  partitioned across N long-lived actors, each holding one shard matrix;
  a query fans out to all shards and merges per-shard top-k. This is the
  100-TB path (the reference is single-shard, SURVEY.md A3).

Exact inner-product search in both (reference default IndexFlatIP); the
HNSW variant is an actor-local drop-in behind the same search() contract.
"""

from __future__ import annotations

import numpy as np

import ray

from ..functions.embed import DEFAULT_DIM, embed_texts


def topk_ids(scores: np.ndarray, ids: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row top-k with deterministic tie-break (score desc, id asc).
    scores: [n, m]; ids: [m] (string ndarray). Returns ([n,k] ids, [n,k] scores)."""
    n, m = scores.shape
    k = min(k, m)
    # argpartition then stable ordering by (-score, id)
    part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    out_ids = np.empty((n, k), dtype=ids.dtype)
    out_scores = np.empty((n, k), dtype=scores.dtype)
    for i in range(n):
        cand = part[i]
        order = np.lexsort((ids[cand], -scores[i, cand]))
        sel = cand[order]
        out_ids[i] = ids[sel]
        out_scores[i] = scores[i, sel]
    return out_ids, out_scores


class BroadcastIndex:
    """Holds (ids, matrix) locally; built from a ray.ObjectRef in actor
    ``__init__`` (zero-copy numpy view from the object store)."""

    def __init__(self, blob):
        if isinstance(blob, ray.ObjectRef):
            blob = ray.get(blob)
        self.ids, self.matrix = blob  # ids: np.ndarray[str], matrix: [m, d] float32

    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        scores = queries @ self.matrix.T
        return topk_ids(scores, self.ids, k)


@ray.remote
class IndexShard:
    """One shard of the entity embedding matrix in a long-lived actor.
    Reference buffered-add analogue (faiss_indexer.py:52-63): shards are
    built incrementally via add() calls of bounded size."""

    def __init__(self):
        self._ids: list[np.ndarray] = []
        self._mats: list[np.ndarray] = []
        self.ids: np.ndarray | None = None
        self.matrix: np.ndarray | None = None

    def add(self, ids: np.ndarray, matrix: np.ndarray) -> int:
        self._ids.append(np.asarray(ids))
        self._mats.append(np.asarray(matrix, dtype=np.float32))
        return sum(len(x) for x in self._ids)

    def seal(self) -> int:
        self.ids = np.concatenate(self._ids) if self._ids else np.empty(0, dtype=object)
        self.matrix = np.vstack(self._mats) if self._mats else np.empty((0, 1), np.float32)
        self._ids, self._mats = [], []
        return len(self.ids)

    def save(self, path: str) -> str:
        """Serialize this shard's sealed (ids, matrix) to an .npz file."""
        if self.matrix is None:
            raise RuntimeError("shard not sealed")
        np.savez_compressed(path, ids=self.ids.astype(str), matrix=self.matrix)
        return path

    def load(self, path: str) -> int:
        """Deserialize a shard file into this actor (replaces add/seal)."""
        data = np.load(path, allow_pickle=False)
        self.ids = data["ids"].astype(object)
        self.matrix = data["matrix"]
        self._ids, self._mats = [], []
        return len(self.ids)

    def search(self, queries: np.ndarray, k: int):
        if self.matrix is None:
            raise RuntimeError("shard not sealed")
        if len(self.ids) == 0:
            n = len(queries)
            return (np.empty((n, 0), dtype=object), np.empty((n, 0), np.float32))
        scores = queries @ self.matrix.T
        return topk_ids(scores, self.ids, min(k, len(self.ids)))


def build_shards(ids: np.ndarray, matrix: np.ndarray, num_shards: int,
                 add_buffer: int = 50_000) -> list:
    """Hash-partition entities across shard actors (deterministic by id)."""
    from ..functions.hashing import hash_strings

    shards = [IndexShard.remote() for _ in range(num_shards)]
    h = hash_strings(list(ids)) % num_shards
    pend = []
    for s in range(num_shards):
        sel = np.nonzero(h == s)[0]
        for lo in range(0, len(sel), add_buffer):
            part = sel[lo:lo + add_buffer]
            pend.append(shards[s].add.remote(ids[part], matrix[part]))
    ray.get(pend)
    ray.get([s.seal.remote() for s in shards])
    return shards


def sharded_topk(shards: list, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Fan-out to every shard, merge per-shard top-k (same tie-break)."""
    results = ray.get([s.search.remote(queries, k) for s in shards])
    all_ids = np.concatenate([r[0] for r in results], axis=1)
    all_scores = np.concatenate([r[1] for r in results], axis=1)
    n = len(queries)
    k = min(k, all_ids.shape[1])
    out_ids = np.empty((n, k), dtype=all_ids.dtype)
    out_scores = np.empty((n, k), dtype=all_scores.dtype)
    for i in range(n):
        order = np.lexsort((all_ids[i], -all_scores[i]))[:k]
        out_ids[i] = all_ids[i][order]
        out_scores[i] = all_scores[i][order]
    return out_ids, out_scores


def save_shards(shards: list, out_dir: str) -> list[str]:
    """S14 index serialization (reference ``faiss_indexer.py:32-44``
    serialize/deserialize): each shard persists its (ids, matrix) as one
    ``.npz`` file written IN PARALLEL by the shard actors themselves (the
    driver never holds a matrix). Returns the written paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = [os.path.join(out_dir, f"shard-{i:05d}.npz") for i in range(len(shards))]
    ray.get([s.save.remote(p) for s, p in zip(shards, paths)])
    return paths


def load_shards(paths: list[str]) -> list:
    """Rebuild the shard-actor pool from serialized shards — one actor per
    file, loading its own file (parallel, driver-side zero data)."""
    shards = [IndexShard.remote() for _ in paths]
    ray.get([s.load.remote(p) for s, p in zip(shards, paths)])
    return shards


def entity_embedding_blob(entities_tbl, dim: int = DEFAULT_DIM):
    """(ids ndarray, [m,d] float32) from an entities Arrow table.

    Embeds the entity's *descriptive* content only (infobox objects; subject
    as fallback when the infobox is empty) — the candidate-repr M6 analogue
    (title + description). Aliases are deliberately excluded so that
    context-vs-description cosine is not inflated by trivial surface-form
    overlap with the mention (that signal lives in strsim)."""
    subs = entities_tbl["subject"].to_pylist()
    ids = np.array(entities_tbl["entity_id"].to_pylist(), dtype=object)
    infobox = entities_tbl["infobox"].to_pylist()
    texts = []
    for s, ib in zip(subs, infobox):
        obj = " ".join(kv["object"] for kv in (ib or []))
        texts.append(obj if obj else s)
    return ids, embed_texts(texts, dim=dim)
