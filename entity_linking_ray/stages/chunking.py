"""Document chunking with overlap — the context-window prep stage.

A training/RAG corpus pipeline slices documents into fixed-size,
overlapping character windows before embedding or packing (the stage
that feeds stages/ann.py and scan.pack_by_token_budget). The reference
truncates candidate descriptions to a single char budget
(el_preprocess.py's description synthesis); this generalizes that to
the standard sliding-chunk rule, deterministically:

    stride   = size - overlap
    n_chunks = 1 + ceil(max(len - size, 0) / stride)   (>= 1, also for
               empty text: one empty chunk keeps every doc represented)
    chunk k  = [k·stride, min(k·stride + size, len))   0-based chars

Pure integer arithmetic (no float ceil) so the DuckDB oracle replicates
the chunk grid bit-exactly. Offsets count CHARACTERS (substr parity on
any script, not bytes).

Vectorization: one batch concatenates into a single buffer and every
chunk string gathers out of it with numpy fancy indexing + one Arrow
``from_buffers`` — no per-chunk Python when the batch is pure ASCII
(the overwhelming web-corpus case); batches containing multibyte text
fall back to per-chunk Python slices (string assembly is inherently
per-object there), equivalence-tested against the fast path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _chunk_grid(lens: np.ndarray, size: int,
                stride: int) -> tuple[np.ndarray, np.ndarray,
                                      np.ndarray, np.ndarray]:
    """→ (doc_row, chunk_idx, start, end) for the whole batch."""
    extra = np.maximum(lens - size, 0)
    n_chunks = 1 + (extra + stride - 1) // stride
    total = int(n_chunks.sum())
    doc_row = np.repeat(np.arange(len(lens), dtype=np.int64), n_chunks)
    seg_start = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    k = np.arange(total, dtype=np.int64) - np.repeat(seg_start, n_chunks)
    start = k * stride
    end = np.minimum(start + size, lens[doc_row])
    return doc_row, k, start, end


def chunk_documents(ds: ray.data.Dataset, *, size: int = 200,
                    overlap: int = 40, col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """→ (id_col, chunk_idx, chunk_start, chunk_end, chunk_text) — the
    overlapping sliding chunks of every document (module docstring for
    the exact grid). Embarrassingly parallel: one map_batches, no
    shuffle; at 100 TB the output feeds the embed/pack stages
    block-by-block without ever materializing."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap

    def chunk(b: pa.Table) -> pa.Table:
        arr = b[col].combine_chunks()
        if arr.null_count:
            raise ValueError("chunk_documents: null text not supported")
        if len(arr) == 0:
            return pa.table({
                id_col: b[id_col],
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_start": pa.array([], pa.int64()),
                "chunk_end": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            })
        lens = pc.utf8_length(arr).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc_row, k, start, end = _chunk_grid(lens, size, stride)
        counts = end - start
        total = int(counts.sum())
        ascii_only = bool(pc.all(pc.equal(
            pc.utf8_length(arr), pc.binary_length(arr))).as_py())
        # Arrow `string` offsets are int32 — a batch whose chunk text
        # totals >= 2 GiB (overlap inflates by size/stride) cannot build
        # one array; such a block is itself an upstream block-size bug,
        # so fail loudly rather than wrap silently
        if total >= 2**31:
            raise ValueError(
                f"chunk_documents: batch expands to {total} chunk bytes "
                "(>= 2 GiB); reduce the input block size "
                "(DataContext.target_max_block_size)")
        if ascii_only:
            # zero-copy gather straight off the Arrow utf-8 data buffer
            # (bytes == chars for ASCII) — no to_pylist/join/encode pass
            from ..functions.hashing import string_array_bytes

            buf, row_off = string_array_bytes(arr)
            gs = row_off[:-1][doc_row] + start
            seg_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
            idx = (np.repeat(gs - seg_start, counts)
                   + np.arange(total, dtype=np.int64))
            values = buf[idx]
            offsets = np.concatenate([[0], np.cumsum(counts)]) \
                .astype(np.int32)
            text_arr = pa.Array.from_buffers(
                pa.string(), len(counts),
                [None, pa.py_buffer(offsets.tobytes()),
                 pa.py_buffer(values.tobytes())])
        else:
            texts = arr.to_pylist()
            text_arr = pa.array(
                [texts[d][s:e] for d, s, e in zip(doc_row, start, end)],
                pa.string())
        return pa.table({
            id_col: b[id_col].take(pa.array(doc_row, pa.int64())),
            "chunk_idx": pa.array(k),
            "chunk_start": pa.array(start),
            "chunk_end": pa.array(end),
            "chunk_text": text_arr,
        })

    return ds.select_columns([id_col, col]).map_batches(
        chunk, batch_format="pyarrow")
