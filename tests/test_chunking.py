"""chunk_documents: exact grid + text parity vs a per-doc reference,
fast (ASCII gather) and fallback (multibyte) paths, edge cases."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from entity_linking_ray.stages.chunking import chunk_documents


def _ref(docs, size, overlap):
    stride = size - overlap
    out = []
    for i, d in enumerate(docs):
        extra = max(len(d) - size, 0)
        nc = 1 + (extra + stride - 1) // stride
        for k in range(nc):
            s = k * stride
            e = min(s + size, len(d))
            out.append((i, k, s, e, d[s:e]))
    return sorted(out)


def test_chunk_documents_matches_reference(ray_session):
    rng = np.random.default_rng(1)
    docs = ["".join(rng.choice(list("abcdef "), rng.integers(0, 700)))
            for _ in range(50)]
    docs[3] = ""                       # empty text: one empty chunk
    docs[5] = "héllo wörld × " * 30    # multibyte: fallback path
    t = pa.table({"doc_id": pa.array(range(50), type=pa.int64()),
                  "text": pa.array(docs)})
    got = chunk_documents(ray.data.from_arrow(t).repartition(3),
                          size=200, overlap=40).to_pandas()
    gl = sorted(zip(got.doc_id, got.chunk_idx, got.chunk_start,
                    got.chunk_end, got.chunk_text))
    assert gl == _ref(docs, 200, 40)
    # boundary: len exactly divisible by stride past size
    t2 = pa.table({"doc_id": pa.array([0], pa.int64()),
                   "text": pa.array(["x" * 360])})
    g2 = chunk_documents(ray.data.from_arrow(t2),
                         size=200, overlap=40).to_pandas()
    assert list(zip(g2.chunk_start, g2.chunk_end)) == [(0, 200), (160, 360)]


def test_chunk_documents_rejects_bad_overlap(ray_session):
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["abc"])})
    with pytest.raises(ValueError):
        chunk_documents(ray.data.from_arrow(t), size=10, overlap=10)
