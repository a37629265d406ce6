"""Corpus generator: determinism + FIXTURES.md §7 edge-case coverage."""

import collections

from entity_linking_ray import schemas
from entity_linking_ray.corpus import HOT_ALIAS, STOPWORD_ALIAS, make_corpus


def test_deterministic(corpus):
    c2 = make_corpus()
    for name in ("documents", "entities", "mentions_gold"):
        assert corpus[name].equals(c2[name])


def test_schemas(corpus):
    assert corpus["documents"].schema.equals(schemas.DOCUMENTS)
    assert corpus["entities"].schema.equals(schemas.ENTITIES)
    assert corpus["mentions_gold"].schema.equals(schemas.MENTIONS_GOLD)


def test_edge_cases(corpus):
    docs = corpus["documents"].to_pylist()
    ents = corpus["entities"].to_pylist()
    gold = corpus["mentions_gold"].to_pylist()

    # hot alias: ≥50 entities, ≥200 mentions
    hot_ents = [e for e in ents if HOT_ALIAS in e["aliases"]]
    assert len(hot_ents) >= 50
    surf = collections.Counter(g["mention"].lower() for g in gold)
    assert surf[HOT_ALIAS] >= 200

    # NIL mentions exist
    assert any(g["entity_id"] == "NIL" for g in gold)
    # stopword alias entity exists
    assert any(STOPWORD_ALIAS in e["aliases"] for e in ents)
    # empty + over-budget infobox
    assert any(not e["infobox"] for e in ents)
    assert any(sum(len(kv["object"]) for kv in e["infobox"]) > 400 for e in ents)
    # duplicate aliases on one entity
    assert any(len(e["aliases"]) != len(set(e["aliases"])) for e in ents)
    # CJK mentions
    assert any(any("一" <= ch <= "鿿" for ch in g["mention"]) for g in gold)
    # structural docs: 0-span, media-only, 100+ spans
    assert any(len(d["spans"]) == 0 for d in docs)
    assert any(d["spans"] and all(s["kind"] != "text" for s in d["spans"]) for d in docs)
    assert any(len(d["spans"]) >= 100 for d in docs)
    # repeated mention surface within one doc
    per_doc = collections.Counter((g["doc_id"], g["mention"]) for g in gold)
    assert any(v >= 2 for v in per_doc.values())


def test_offsets_strictly_increasing_and_valid(corpus):
    dmap = {d["doc_id"]: d["spans"] for d in corpus["documents"].to_pylist()}
    for spans in dmap.values():
        offs = [s["offset"] for s in spans or []]
        assert offs == sorted(offs)
    for g in corpus["mentions_gold"].to_pylist():
        sp = dmap[g["doc_id"]][g["span_idx"]]
        rel = g["offset"] - sp["offset"]
        assert sp["text"][rel:rel + len(g["mention"])] == g["mention"]
