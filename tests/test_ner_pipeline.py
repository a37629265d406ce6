"""NER-driven mention path composed through candidates → scoring — the
reference's Flair-path lifecycle (NER propose → dense retrieve → score)
with the heuristic proposer, proving the alternative mention source runs
the SAME downstream stages unchanged."""

import pyarrow as pa

import ray
import ray.data

from entity_linking_ray import schemas
from entity_linking_ray.stages.candidates import generate_candidates, make_kb_blob
from entity_linking_ray.stages.ner import ner_mentions
from entity_linking_ray.stages.pairwise import link_mentions, score_and_link


def test_ner_to_link_pipeline(ray_session):
    ents = pa.Table.from_pylist([
        {"entity_id": "E1", "subject": "Ada Lovelace", "aliases": ["Ada Lovelace"],
         "types": ["Person"],
         "infobox": [{"predicate": "p", "object": "mathematician programs analytical engine"}]},
        {"entity_id": "E2", "subject": "London", "aliases": ["London"],
         "types": ["Place"],
         "infobox": [{"predicate": "p", "object": "city england capital thames"}]},
    ], schema=schemas.ENTITIES)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["d1"], pa.string()),
        "spans": pa.array([[
            {"kind": "text",
             "text": "Ada Lovelace wrote the first programs. She lived in London.",
             "media_ref": "", "offset": 0},
        ]], pa.list_(schemas.SPAN_STRUCT)),
    }))

    mentions = ner_mentions(docs, concurrency=2)
    kb_ref = ray.put(make_kb_blob(ents))
    cands = generate_candidates(mentions, kb_ref, k=5, ann_k=2, concurrency=2)
    scored_ds = cands.map_batches(lambda b: score_and_link(b, threshold=0.2),
                                  batch_format="pyarrow")
    scored = scored_ds.to_pandas()
    by_mention = dict(zip(scored["mention"], scored["entity_id"]))
    # exact-alias candidates win: both NER-proposed mentions link correctly
    assert by_mention["Ada Lovelace"] == "E1"
    assert by_mention["London"] == "E2"

    # the links projection consumes the NER-sourced scored table unchanged
    links = link_mentions(scored_ds).to_pandas()
    assert set(links.columns) == {"doc_id", "span_idx", "offset",
                                  "entity_id", "score", "node"}
    assert set(links["entity_id"]) == {"E1", "E2"}
