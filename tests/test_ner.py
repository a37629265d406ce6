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
