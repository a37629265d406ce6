"""Lexical (BM25-style) candidate retrieval — stages/lexical.py."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from entity_linking_ray.stages.lexical import (IDF_SCALE,
                                               build_lexical_index,
                                               lexical_topk, score_batch)


@pytest.fixture(scope="module")
def tiny():
    ents = {
        101: "red metal box",
        102: "blue metal ring",
        103: "green glass ring prism",
        104: "red glass",
    }
    docs = pa.table({
        "doc_id": pa.array(["d1", "d2", "d3", "d4"], pa.string()),
        "text": pa.array([
            "the red metal box fell",
            "a ring of blue metal",
            "glass prism and glass again",   # repeated token counts once
            "nothing matches here",
        ]),
    })
    return ents, docs


def _brute(ents, doc_text, k=3):
    """Set-semantics idf-sum reference."""
    import math
    n = len(ents)
    tok_ent = {}
    for e, t in ents.items():
        for tok in set(t.split()):
            tok_ent.setdefault(tok, set()).add(e)
    units = {t: round(math.log(n / len(es)) * IDF_SCALE)
             for t, es in tok_ent.items()}
    scores = {}
    for tok in set(doc_text.split()):
        for e in tok_ent.get(tok, ()):
            scores[e] = scores.get(e, 0) + units[tok]
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(e, s, i + 1) for i, (e, s) in enumerate(ranked)]


def test_lexical_topk_matches_bruteforce(ray_session, tiny):
    ents, docs = tiny
    got = lexical_topk(ray.data.from_arrow(docs),
                       entity_ids=np.array(sorted(ents), np.int64),
                       entity_texts=[ents[e] for e in sorted(ents)],
                       k=3, out_entity_col="entity_id").to_pandas()
    for doc_id, text in zip(docs["doc_id"].to_pylist(),
                            docs["text"].to_pylist()):
        want = _brute(ents, text)
        rows = got[got["doc_id"] == doc_id].sort_values("rn")
        assert [(int(e), int(s), int(r)) for e, s, r in
                zip(rows["entity_id"], rows["score_units"], rows["rn"])] \
            == want
    assert not (got["doc_id"] == "d4").any()  # zero overlap → absent


def test_lexical_join_plan_equivalent(ray_session, tiny):
    """broadcast_token_cap=0 forces the distributed-join plan — identical
    rows to the broadcast plan."""
    ents, docs = tiny
    kw = dict(entity_ids=np.array(sorted(ents), np.int64),
              entity_texts=[ents[e] for e in sorted(ents)],
              k=3, out_entity_col="entity_id")
    a = (lexical_topk(ray.data.from_arrow(docs), **kw).to_pandas()
         .sort_values(["doc_id", "rn"]).reset_index(drop=True))
    b = (lexical_topk(ray.data.from_arrow(docs), broadcast_token_cap=0,
                      num_partitions=2, **kw).to_pandas()
         .sort_values(["doc_id", "rn"]).reset_index(drop=True))
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_score_batch_dedups_query_tokens(tiny):
    """Repeated tokens in one query count once (set semantics)."""
    ents, _ = tiny
    ix = build_lexical_index(np.array(sorted(ents), np.int64),
                             [ents[e] for e in sorted(ents)])
    toks = np.array(["glass", "glass", "glass"], object)
    rows = np.zeros(3, np.int64)
    q, e, s, rn = score_batch(ix, rows, toks, k=5)
    once = score_batch(ix, np.zeros(1, np.int64),
                       np.array(["glass"], object), k=5)
    assert (s == once[2]).all() and len(q) == len(once[0])
