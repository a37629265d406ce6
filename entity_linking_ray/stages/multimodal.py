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
  clear message otherwise. A real deployment drops the decode body in
  without touching the Ray plumbing.

Media payload guidance (SURVEY.md memory-pressure row): large binary
payloads ⇒ small ``batch_size`` (default 64) so batch × concurrency fits
worker heaps; blocks of decoded features stay bounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..functions.hashing import hash_strings, splitmix64

FEATURE_DIM = 32


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
        raise NotImplementedError  # pragma: no cover

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "span_idx": [], "kind": [], "media_ref": [], "feature": []}
        for doc_id, spans in zip(batch["doc_id"].to_pylist(), batch["spans"].to_pylist()):
            for si, sp in enumerate(spans or []):
                if sp["kind"] == "text":
                    continue
                out["doc_id"].append(doc_id)
                out["span_idx"].append(si)
                out["kind"].append(sp["kind"])
                out["media_ref"].append(sp["media_ref"])
                out["feature"].append(self._decode(sp["kind"], sp["media_ref"]))
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "span_idx": pa.array(out["span_idx"], pa.int32()),
            "kind": pa.array(out["kind"], pa.string()),
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "feature": pa.array(
                [v.tolist() for v in out["feature"]], pa.list_(pa.float32())
            ),
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
        if self.decoder != "fake":  # pragma: no cover
            raise NotImplementedError
        h = np.uint64(int(hash_strings([media_ref])[0]))
        src_w = 16 + int(h % np.uint64(4096))
        src_h = 16 + int((h >> np.uint64(12)) % np.uint64(4096))
        n = self.width * self.height
        seeds = splitmix64(np.arange(n, dtype=np.uint64) + h)
        return src_w, src_h, (seeds & np.uint64(0xFF)).astype(np.uint8).tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("doc_id", "span_idx", "media_ref",
                               "src_width", "src_height", "pixels")}
        for doc_id, spans in zip(batch["doc_id"].to_pylist(),
                                 batch["spans"].to_pylist()):
            for si, sp in enumerate(spans or []):
                if sp["kind"] != "image":
                    continue
                sw, sh, px = self._decode_resize(sp["media_ref"])
                out["doc_id"].append(doc_id)
                out["span_idx"].append(si)
                out["media_ref"].append(sp["media_ref"])
                out["src_width"].append(sw)
                out["src_height"].append(sh)
                out["pixels"].append(px)
        n = len(out["doc_id"])
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "span_idx": pa.array(out["span_idx"], pa.int32()),
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "src_width": pa.array(out["src_width"], pa.int32()),
            "src_height": pa.array(out["src_height"], pa.int32()),
            "width": pa.array(np.full(n, self.width, np.int32)),
            "height": pa.array(np.full(n, self.height, np.int32)),
            "pixels": pa.array(out["pixels"], pa.binary()),
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

    def _meta(self, media_ref: str) -> tuple[int, float]:
        h = np.uint64(int(hash_strings([media_ref])[0]))
        n_frames = 1 + int(h % np.uint64(600))
        fps = 10.0 + float((h >> np.uint64(10)) % np.uint64(50))
        return n_frames, fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("doc_id", "span_idx", "media_ref",
                               "frame_idx", "frame_ts_us", "frame")}
        for doc_id, spans in zip(batch["doc_id"].to_pylist(),
                                 batch["spans"].to_pylist()):
            for si, sp in enumerate(spans or []):
                if sp["kind"] not in ("audio", "video"):
                    continue
                n_frames, fps = self._meta(sp["media_ref"])
                idxs = np.arange(0, n_frames, self.stride)[:self.max_frames]
                h = np.uint64(int(hash_strings([sp["media_ref"]])[0]))
                for fi in idxs:
                    seeds = splitmix64(
                        np.arange(self.frame_bytes, dtype=np.uint64)
                        + h + np.uint64(int(fi)))
                    out["doc_id"].append(doc_id)
                    out["span_idx"].append(si)
                    out["media_ref"].append(sp["media_ref"])
                    out["frame_idx"].append(int(fi))
                    out["frame_ts_us"].append(int(fi / fps * 1e6))
                    out["frame"].append(
                        (seeds & np.uint64(0xFF)).astype(np.uint8).tobytes())
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "span_idx": pa.array(out["span_idx"], pa.int32()),
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "frame_idx": pa.array(out["frame_idx"], pa.int32()),
            "frame_ts_us": pa.array(out["frame_ts_us"], pa.int64()),
            "frame": pa.array(out["frame"], pa.binary()),
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
