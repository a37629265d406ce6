"""M1/A7 NER mention proposal: heuristic engine + stage composition."""

import pyarrow as pa

import ray
import ray.data

from entity_linking_ray import schemas
from entity_linking_ray.stages.ner import HeuristicNER, ner_mentions


def test_heuristic_ner_contract():
    ner = HeuristicNER()
    res = ner.predict(["Barack Obama visited Paris today.",
                       "The weather was nice."])
    assert set(res) == {"sentences", "mentions"}
    got = {(m["sent_idx"], m["text"]) for m in res["mentions"]}
    assert (0, "Barack Obama") in got
    assert (0, "Paris") in got
    # sentence-initial "The" alone proposes nothing
    assert not any(m["text"] == "The" for m in res["mentions"])
    # offsets point into the sentence
    for m in res["mentions"]:
        sent = res["sentences"][m["sent_idx"]]
        assert sent[m["start_pos"]:m["end_pos"]] == m["text"]


def test_heuristic_ner_midsentence_function_word():
    res = HeuristicNER().predict(["He lives near The Hague in winter."])
    assert any(m["text"] == "The Hague" for m in res["mentions"])


def test_ner_mentions_stage(ray_session):
    docs = pa.table({
        "doc_id": pa.array(["d1"], pa.string()),
        "spans": pa.array([[
            {"kind": "text", "text": "Ada Lovelace wrote programs.",
             "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": "media://x", "offset": 29},
            {"kind": "text", "text": "She lived in London then.",
             "media_ref": "", "offset": 30},
        ]], pa.list_(schemas.SPAN_STRUCT)),
    })
    out = ner_mentions(ray.data.from_arrow(docs), concurrency=2).to_pandas()
    got = set(zip(out["mention"], out["span_idx"], out["offset"]))
    assert ("Ada Lovelace", 0, 0) in got
    assert ("London", 2, 30 + 13) in got
    # same schema as the dictionary extractor → composes with candidates
    assert list(out.columns) == ["doc_id", "span_idx", "mention", "norm_mention",
                                 "context_left", "context_right", "offset"]


def test_ner_stage_one_predict_call_per_batch():
    """The stage must make ONE predict(texts) call per Arrow batch (the
    reference contract is list-in/list-out, entity_candidate/ner.py:29-42
    — per-span calls would serialize GPU batching) and produce output
    identical to tagging each span individually."""
    from entity_linking_ray.stages.ner import NERMentionStage

    class CountingNER(HeuristicNER):
        def __init__(self):
            super().__init__()
            self.calls = 0

        def predict(self, sentences):
            self.calls += 1
            return super().predict(sentences)

    docs = pa.table({
        "doc_id": pa.array(["d1", "d2"], pa.string()),
        "spans": pa.array([
            [{"kind": "text", "text": "Ada Lovelace wrote programs.",
              "media_ref": "", "offset": 0},
             {"kind": "text", "text": "She lived in London then.",
              "media_ref": "", "offset": 29}],
            [{"kind": "image", "text": "", "media_ref": "media://x", "offset": 0},
             {"kind": "text", "text": "Alan Turing worked in Bletchley Park.",
              "media_ref": "", "offset": 10}],
        ]),
    })
    stage = NERMentionStage()
    stage.model = CountingNER()
    got = stage(docs)
    assert stage.model.calls == 1

    # per-span reference answer via individual predict calls
    exp_rows = []
    for doc_id, spans in zip(docs["doc_id"].to_pylist(), docs["spans"].to_pylist()):
        for si, sp in enumerate(spans):
            if sp["kind"] != "text" or not sp["text"]:
                continue
            for m in HeuristicNER().predict([sp["text"]])["mentions"]:
                exp_rows.append((doc_id, si, m["text"], sp["offset"] + m["start_pos"]))
    got_rows = list(zip(got["doc_id"].to_pylist(), got["span_idx"].to_pylist(),
                        got["mention"].to_pylist(), got["offset"].to_pylist()))
    assert got_rows == exp_rows and len(got_rows) >= 4
