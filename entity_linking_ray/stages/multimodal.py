"""Multimodal span processing: decode / feature-extract media spans.

The interleaved documents carry media spans as (kind, media_ref) with
empty text — opaque references with typed metadata. This stage is the
actor-pool plumbing for decode/resize/frame-sample work: schema, batch
size, actor signature and output layout are real and tested; the actual
byte decoding is STUBBED because no image/audio libraries ship in this
container.

- ``decoder="fake"`` (default): deterministic pseudo-decode — features
  derived from the media_ref hash. Lets the whole pipeline (including
  tests and benchmarks) exercise the stage end-to-end.
- ``decoder="real"``: import-tries PIL; raises NotImplementedError with a
  clear message when PIL is absent (this sandbox), decodes for real when
  present — the PIL branches satisfy the SAME output contract as the
  fake (contract-tested, skip-marked where PIL is unavailable).

Media payload guidance (SURVEY.md memory-pressure row): large binary
payloads ⇒ small ``batch_size`` (default 64) so batch × concurrency fits
worker heaps; blocks of decoded features stay bounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.hashing import hash_strings, hash_strings_arrow, splitmix64

FEATURE_DIM = 32


def _explode_media_spans(batch: pa.Table, kinds: "tuple[str, ...] | None"):
    """Vectorized explode of the interleaved ``spans`` list<struct> column:
    Arrow list-flatten + kind filter, so the per-item decode loops below
    only ever touch media rows (reference stores spans the same way —
    this is the Ray-side flatten of that layout).

    Returns ``(doc_id: pa.Array, span_idx: np.int32[], kind: pa.Array,
    media_ref: pa.Array)`` for the spans whose kind is in ``kinds``
    (``None`` = every non-text span).
    """
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lens = pc.list_value_length(spans).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        empty_s = pa.array([], pa.string())
        return empty_s, np.array([], np.int32), empty_s, empty_s
    parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    span_idx = (np.arange(total, dtype=np.int64)
                - np.repeat(starts, lens)).astype(np.int32)
    flat = pc.list_flatten(spans)  # struct rows, aligned with parent/span_idx
    kind = pc.struct_field(flat, "kind")
    ref = pc.struct_field(flat, "media_ref")
    if kinds is None:
        mask = pc.invert(pc.equal(kind, "text"))
    else:
        mask = pc.is_in(kind, value_set=pa.array(list(kinds)))
    sel = np.flatnonzero(
        pc.fill_null(mask, False).to_numpy(zero_copy_only=False))
    doc_col = batch["doc_id"]
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    idx = pa.array(sel)
    return (doc_col.take(pa.array(parent[sel])), span_idx[sel],
            kind.take(idx), ref.take(idx))


def _binary_from_matrix(rows: np.ndarray) -> pa.Array:
    """(n, w) uint8 matrix → Arrow binary array of n w-byte values,
    zero-copy except the single ravel — no per-row bytes() loop."""
    n, w = rows.shape
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * w)
    data = pa.py_buffer(np.ascontiguousarray(rows).tobytes())
    return pa.Array.from_buffers(pa.binary(), n,
                                 [None, offsets.buffers()[1], data])


class MediaFeatureExtractor:
    """map_batches actor over documents: explodes media spans into
    (doc_id, span_idx, kind, media_ref, feature: list<float32>) rows."""

    def __init__(self, decoder: str = "fake", feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        self.decoder = decoder
        if decoder == "real":  # pragma: no cover - libs not in sandbox
            try:
                import PIL.Image  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "real media decoding needs an image/audio library that is "
                    "not available in this container; use decoder='fake' "
                    "(deterministic pseudo-decode) or install PIL/torchaudio"
                ) from exc

    def _decode(self, kind: str, media_ref: str) -> np.ndarray:
        if self.decoder == "fake":
            h = hash_strings([f"{kind}|{media_ref}"])[0]
            seeds = splitmix64(
                np.arange(self.feature_dim, dtype=np.uint64) + np.uint64(int(h))
            )
            v = (seeds.astype(np.float64) / 2**64 - 0.5).astype(np.float32)
            n = np.linalg.norm(v)
            return v / n if n > 0 else v
        # real branch (PIL import already verified in __init__): media_ref
        # is a readable path/file; the feature is the unit-normalized
        # grayscale thumbnail — SAME output contract as the fake
        # (float32[feature_dim], unit norm), contract-tested skip-if-no-PIL
        import PIL.Image

        img = PIL.Image.open(media_ref).convert("L") \
            .resize((self.feature_dim, 1))
        v = (np.asarray(img, np.float32).ravel()[:self.feature_dim]
             / 255.0 - 0.5)
        n = np.linalg.norm(v)
        return (v / n if n > 0 else v).astype(np.float32)

    def _decode_many(self, kinds: list, refs: list) -> np.ndarray:
        """Batched fake decode: one splitmix broadcast for every media
        span in the batch (row-identical to per-span ``_decode``). A real
        decoder replaces this with a batched model/codec call."""
        if self.decoder != "fake":
            return np.stack([self._decode(k, r) for k, r in zip(kinds, refs)])
        h = hash_strings([f"{k}|{r}" for k, r in zip(kinds, refs)]) \
            .astype(np.uint64)
        seeds = splitmix64(np.arange(self.feature_dim, dtype=np.uint64)[None, :]
                           + h[:, None])
        v = (seeds.astype(np.float64) / 2**64 - 0.5).astype(np.float32)
        nrm = np.linalg.norm(v, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        return v / nrm

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id, span_idx, kind, ref = _explode_media_spans(batch, None)
        n = len(doc_id)
        if n:
            feats = self._decode_many(kind.to_pylist(), ref.to_pylist())
        else:
            feats = np.zeros((0, self.feature_dim), np.float32)
        feature = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * self.feature_dim),
            pa.array(feats.ravel(), pa.float32()))
        return pa.table({
            "doc_id": pc.cast(doc_id, pa.string()),
            "span_idx": pa.array(span_idx, pa.int32()),
            "kind": pc.cast(kind, pa.string()),
            "media_ref": pc.cast(ref, pa.string()),
            "feature": feature,
        })


def extract_media_features(docs: ray.data.Dataset, decoder: str = "fake",
                           concurrency: int | tuple = 2,
                           batch_size: int = 64) -> ray.data.Dataset:
    return docs.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaResizer:
    """map_batches actor: image spans → decoded-and-resized payload rows
    (doc_id, span_idx, media_ref, src_width, src_height, width, height,
    pixels: binary). The resize contract (output is exactly
    ``width*height`` bytes of row-major luminance) is real and tested;
    the decode body is the sandbox stub — ``decoder="fake"`` synthesizes
    a deterministic source size and payload from the ref hash, so
    downstream stages (and the memory-sizing guidance: payload bytes =
    batch_size × width × height per in-flight batch) exercise the true
    data volumes."""

    def __init__(self, width: int = 64, height: int = 64,
                 decoder: str = "fake"):
        self.width = width
        self.height = height
        self.decoder = decoder
        if decoder == "real":  # pragma: no cover - libs not in sandbox
            try:
                import PIL.Image  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "real image decode/resize needs PIL, not available in "
                    "this container; use decoder='fake'") from exc

    def _decode_resize(self, media_ref: str) -> tuple[int, int, bytes]:
        if self.decoder != "fake":
            # real branch (PIL presence verified in __init__): same output
            # contract as the fake — (src_w, src_h, width*height luminance
            # bytes) — contract-tested skip-if-no-PIL
            import PIL.Image

            img = PIL.Image.open(media_ref)
            src_w, src_h = img.size
            small = img.convert("L").resize((self.width, self.height))
            return src_w, src_h, np.asarray(small, np.uint8).tobytes()
        h = np.uint64(int(hash_strings([media_ref])[0]))
        src_w = 16 + int(h % np.uint64(4096))
        src_h = 16 + int((h >> np.uint64(12)) % np.uint64(4096))
        n = self.width * self.height
        seeds = splitmix64(np.arange(n, dtype=np.uint64) + h)
        return src_w, src_h, (seeds & np.uint64(0xFF)).astype(np.uint8).tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id, span_idx, _, ref = _explode_media_spans(batch, ("image",))
        n = len(doc_id)
        if n and self.decoder != "fake":
            triples = [self._decode_resize(r) for r in ref.to_pylist()]
            src_w = np.array([t[0] for t in triples], np.int32)
            src_h = np.array([t[1] for t in triples], np.int32)
            pixels = pa.array([t[2] for t in triples], pa.binary())
        elif n:
            h = hash_strings_arrow(ref).astype(np.uint64)
            src_w = 16 + (h % np.uint64(4096)).astype(np.int32)
            src_h = 16 + ((h >> np.uint64(12)) % np.uint64(4096)).astype(np.int32)
            npx = self.width * self.height
            seeds = splitmix64(np.arange(npx, dtype=np.uint64)[None, :]
                               + h[:, None])
            pixels = _binary_from_matrix(
                (seeds & np.uint64(0xFF)).astype(np.uint8))
        else:
            src_w = src_h = np.array([], np.int32)
            pixels = pa.array([], pa.binary())
        return pa.table({
            "doc_id": pc.cast(doc_id, pa.string()),
            "span_idx": pa.array(span_idx, pa.int32()),
            "media_ref": pc.cast(ref, pa.string()),
            "src_width": pa.array(src_w, pa.int32()),
            "src_height": pa.array(src_h, pa.int32()),
            "width": pa.array(np.full(n, self.width, np.int32)),
            "height": pa.array(np.full(n, self.height, np.int32)),
            "pixels": pixels,
        })


class FrameSampler:
    """map_batches actor: audio/video spans → one row per SAMPLED frame
    (doc_id, span_idx, media_ref, frame_idx, frame_ts_us, frame: binary)
    — the explode shape for frame-level feature pipelines. Sampling
    picks every ``stride``-th frame capped at ``max_frames`` (uniform
    head sampling; a real deployment swaps the decode body, the row
    layout and caps stay). ``decoder="fake"`` synthesizes duration/fps
    deterministically from the ref hash."""

    def __init__(self, stride: int = 10, max_frames: int = 8,
                 frame_bytes: int = 256, decoder: str = "fake"):
        self.stride = max(1, stride)
        self.max_frames = max_frames
        self.frame_bytes = frame_bytes
        self.decoder = decoder
        if decoder == "real":  # pragma: no cover
            raise NotImplementedError(
                "real frame decoding needs av/ffmpeg, not available in "
                "this container; use decoder='fake'")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id, span_idx, _, ref = _explode_media_spans(
            batch, ("audio", "video"))
        n = len(doc_id)
        if n == 0:
            return pa.table({
                "doc_id": pa.array([], pa.string()),
                "span_idx": pa.array([], pa.int32()),
                "media_ref": pa.array([], pa.string()),
                "frame_idx": pa.array([], pa.int32()),
                "frame_ts_us": pa.array([], pa.int64()),
                "frame": pa.array([], pa.binary()),
            })
        h = hash_strings_arrow(ref).astype(np.uint64)
        n_frames = 1 + (h % np.uint64(600)).astype(np.int64)
        fps = 10.0 + ((h >> np.uint64(10)) % np.uint64(50)).astype(np.float64)
        # frames per span: every stride-th frame, capped at max_frames
        counts = np.minimum((n_frames + self.stride - 1) // self.stride,
                            self.max_frames).astype(np.int64)
        total = int(counts.sum())
        rep = np.repeat(np.arange(n, dtype=np.int64), counts)
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.concatenate([[0], np.cumsum(counts)[:-1]]),
                              counts))
        frame_idx = within * self.stride
        ts_us = (frame_idx / fps[rep] * 1e6).astype(np.int64)
        seeds = splitmix64(np.arange(self.frame_bytes, dtype=np.uint64)[None, :]
                           + (h[rep] + frame_idx.astype(np.uint64))[:, None])
        frames = _binary_from_matrix((seeds & np.uint64(0xFF)).astype(np.uint8))
        take = pa.array(rep)
        return pa.table({
            "doc_id": pc.cast(doc_id.take(take), pa.string()),
            "span_idx": pa.array(span_idx[rep], pa.int32()),
            "media_ref": pc.cast(ref.take(take), pa.string()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame_ts_us": pa.array(ts_us, pa.int64()),
            "frame": frames,
        })


def resize_media(docs: ray.data.Dataset, *, width: int = 64,
                 height: int = 64, decoder: str = "fake",
                 concurrency: int | tuple = 2,
                 batch_size: int = 64) -> ray.data.Dataset:
    return docs.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"width": width, "height": height,
                               "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def sample_frames(docs: ray.data.Dataset, *, stride: int = 10,
                  max_frames: int = 8, decoder: str = "fake",
                  concurrency: int | tuple = 2,
                  batch_size: int = 32) -> ray.data.Dataset:
    # frame explode multiplies rows by ≤ max_frames: smaller input batch
    # keeps payload bytes (batch × max_frames × frame_bytes) bounded
    return docs.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": stride, "max_frames": max_frames,
                               "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
