"""Multimodal media-feature stage: real Ray plumbing, deterministic fake
decode, clear NotImplementedError for the real decoder."""

import numpy as np
import pytest

import ray
import ray.data

from entity_linking_ray.stages.multimodal import MediaFeatureExtractor, extract_media_features


def test_extracts_only_media_spans(corpus):
    docs = ray.data.from_arrow(corpus["documents"])
    out = extract_media_features(docs, concurrency=2).to_pandas()
    assert len(out) > 0
    assert set(out["kind"]) <= {"image", "audio", "table"}
    assert (out["media_ref"].str.startswith("media://")).all()
    # feature vectors are unit-norm, fixed dim
    feats = np.stack(out["feature"].map(np.asarray))
    assert feats.shape[1] == 32
    assert np.allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-5)


def test_fake_decode_deterministic():
    ex = MediaFeatureExtractor()
    a = ex._decode("image", "media://x/1")
    b = ex._decode("image", "media://x/1")
    c = ex._decode("audio", "media://x/1")
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_vectorized_explode_matches_scalar(corpus):
    """The Arrow-kernel span explode + batched fake decode must be
    row-identical to the scalar per-span reference (order, values,
    features, frame bytes)."""
    from entity_linking_ray.stages.multimodal import sample_frames
    from entity_linking_ray.functions.hashing import hash_strings, splitmix64

    docs = ray.data.from_arrow(corpus["documents"])
    out = extract_media_features(docs, concurrency=1).to_pandas()
    out = out.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)

    # scalar reference: python loop over every span
    ex = MediaFeatureExtractor()
    ref_rows = []
    for doc_id, spans in zip(corpus["documents"]["doc_id"].to_pylist(),
                             corpus["documents"]["spans"].to_pylist()):
        for si, sp in enumerate(spans or []):
            if sp["kind"] == "text":
                continue
            ref_rows.append((doc_id, si, sp["kind"], sp["media_ref"],
                             ex._decode(sp["kind"], sp["media_ref"])))
    ref_rows.sort(key=lambda r: (r[0], r[1]))
    assert len(out) == len(ref_rows)
    for (_, row), (doc_id, si, kind, mref, feat) in zip(out.iterrows(), ref_rows):
        assert (row["doc_id"], row["span_idx"], row["kind"],
                row["media_ref"]) == (doc_id, si, kind, mref)
        assert np.allclose(np.asarray(row["feature"]), feat)

    # frame sampler: spot-check one span's frame bytes vs the scalar recipe
    fr = sample_frames(docs, stride=7, max_frames=3).to_pandas()
    row = fr.sort_values(["doc_id", "span_idx", "frame_idx"]).iloc[0]
    h = np.uint64(int(hash_strings([row["media_ref"]])[0]))
    seeds = splitmix64(np.arange(256, dtype=np.uint64) + h
                       + np.uint64(int(row["frame_idx"])))
    assert row["frame"] == (seeds & np.uint64(0xFF)).astype(np.uint8).tobytes()


def test_real_decoder_raises_clearly():
    with pytest.raises(NotImplementedError, match="image/audio library"):
        MediaFeatureExtractor(decoder="real")


def test_langid_accuracy_on_testdata():
    """Language-ID heuristic vs the testdata lang labels (en/fr/es/de have
    stopword signal; zh requires CJK which this corpus lacks — excluded)."""
    import pyarrow.parquet as pq

    from entity_linking_ray.functions.textstats import detect_language

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["text", "lang"])
    texts, langs = t["text"].to_pylist(), t["lang"].to_pylist()
    scored = [(detect_language(x), l) for x, l in zip(texts, langs) if l == "en"]
    acc = sum(1 for p, l in scored if p == l) / len(scored)
    # synthetic corpus text is english-ish function words for every lang
    # label; at minimum the english docs must be recognized
    assert acc >= 0.9


def test_resize_media_contract(corpus):
    from entity_linking_ray.stages.multimodal import resize_media

    docs = ray.data.from_arrow(corpus["documents"])
    out = resize_media(docs, width=8, height=6, concurrency=(1, 2)).to_pandas()
    assert len(out) > 0
    # resize contract: payload is EXACTLY width*height bytes, every row
    assert (out["pixels"].map(len) == 8 * 6).all()
    assert (out["width"] == 8).all() and (out["height"] == 6).all()
    assert (out["src_width"] >= 16).all() and (out["src_height"] >= 16).all()
    # only image spans explode
    docs_pd = corpus["documents"].to_pandas()
    n_img = sum(1 for spans in docs_pd["spans"]
                for sp in (spans if spans is not None else [])
                if sp["kind"] == "image")
    assert len(out) == n_img
    # deterministic across runs
    out2 = resize_media(docs, width=8, height=6).to_pandas()
    a = out.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    assert (a["pixels"] == b["pixels"]).all()


def test_sample_frames_caps_and_layout(corpus):
    from entity_linking_ray.stages.multimodal import sample_frames

    docs = ray.data.from_arrow(corpus["documents"])
    out = sample_frames(docs, stride=7, max_frames=5).to_pandas()
    assert len(out) > 0
    g = out.groupby(["doc_id", "span_idx"])
    assert (g.size() <= 5).all()
    # frame indices follow the stride and timestamps are monotone per span
    for _, grp in g:
        idx = grp.sort_values("frame_idx")["frame_idx"].to_numpy()
        assert (idx % 7 == 0).all()
        ts = grp.sort_values("frame_idx")["frame_ts_us"].to_numpy()
        assert (np.diff(ts) > 0).all()
    assert (out["frame"].map(len) == 256).all()
    # only audio/video spans explode (the corpus has audio + image + table)
    assert set(np.unique(out["media_ref"].map(lambda r: r.startswith("media://")))) == {True}
