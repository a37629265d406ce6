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
