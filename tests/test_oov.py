"""Statistical OOV mention channel (stages/oov.py)."""

import numpy as np
import pyarrow as pa

import ray
import ray.data


def test_bmes_tables_and_viterbi_segment_known_shapes():
    """Tables trained from a tiny CJK lexicon segment a concatenation of
    lexicon words back into those words (the HMM recovers what it was
    trained on — the jieba finalseg property)."""
    from entity_linking_ray.stages.oov import (cut_bmes,
                                               train_bmes_from_lexicon)

    lex = ["北京", "大学", "研究院", "数据"]
    model = train_bmes_from_lexicon(lex)
    text = "北京大学研究院"
    segs = [text[s:e] for s, e in cut_bmes(text, model)]
    assert segs == ["北京", "大学", "研究院"]
    # singletons flush too: unseen char decodes without crashing
    assert cut_bmes("夜", model) == [(0, 1)]
    assert cut_bmes("", model) == []


def test_oov_detector_proposes_planted_entities():
    """Recall fixture (round-5 VERDICT #6): planted OOV entities — one
    capitalized multi-token name, one novel CJK word — are proposed;
    lexicon-known surfaces and incoherent capitalized pairs are not."""
    from entity_linking_ray.stages.oov import OOVMentionDetector

    lex = ["alpha prime", "zorblatt", "北京", "大学"]
    det = OOVMentionDetector(lex, min_cohesion=0.3)
    sents = [
        "We met Quuxon Dynamics at the fair. Quuxon Dynamics builds engines.",
        "Alpha Prime attended too.",          # known alias → silent
        "the 新数据所 report cites 北京 again",  # novel CJK word vs known
        "Yesterday Bob Quickly left.",        # one-off pair: low cohesion
    ]
    out = det.predict(sents)["mentions"]
    texts = {m["text"] for m in out}
    assert "Quuxon Dynamics" in texts          # repeated pair: coherent
    assert "新数据所" in texts                   # CJK OOV segment
    assert "Alpha Prime" not in texts          # known alias suppressed
    assert "北京" not in texts
    assert all(m["text"] != "Bob Quickly" for m in out)
    # offsets are span-accurate
    q = [m for m in out if m["text"] == "Quuxon Dynamics"][0]
    assert sents[q["sent_idx"]][q["start_pos"]:q["end_pos"]] \
        == "Quuxon Dynamics"


def test_flagship_oov_channel_nil_rows_and_f1(ray_session, corpus):
    """oov_channel=True: OOV proposals appear as NIL mentions / singleton
    clusters; the pairwise-F1 and B³ gates stay 1.0 (gold mentions are
    all lexicon-known, so the extra NIL rows never touch them)."""
    from entity_linking_ray.pipelines import eval as ev
    from entity_linking_ray.pipelines.link_and_cluster import run_pipeline

    docs = ray.data.from_arrow(corpus["documents"])
    out = run_pipeline(docs, corpus["entities"], hot_cap=100,
                       concurrency=2, oov_channel=True)
    clusters = out["clusters"].to_pandas()
    gold = corpus["mentions_gold"].to_pandas()
    assert ev.pairwise_f1(clusters, gold)["f1"] == 1.0
    assert ev.b_cubed(clusters, gold)["f1"] == 1.0

    base = run_pipeline(docs, corpus["entities"], hot_cap=100,
                        concurrency=2)
    # the channel only ADDS rows (NIL singletons for unknown surfaces)
    assert len(clusters) >= len(base["clusters"].to_pandas())
