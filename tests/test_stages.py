"""Per-stage unit tests: mentions, alias index, blocking, ANN, candidates
(incl. the J8 precedence merge), description column."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from entity_linking_ray import schemas
from entity_linking_ray.stages.alias_index import build_alias_index, collect_alias_dict
from entity_linking_ray.stages.ann import (
    BroadcastIndex, build_shards, entity_embedding_blob, sharded_topk, topk_ids,
)
from entity_linking_ray.stages.blocking import (
    add_block_key, add_salted_key, block_sizes, hot_keys, lsh_band_rows,
)
from entity_linking_ray.stages.candidates import CandidateGenerator, make_kb_blob
from entity_linking_ray.stages.mentions import AliasMatcher, MentionExtractor


def _ents(rows):
    return pa.Table.from_pylist(rows, schema=schemas.ENTITIES)


class TestAliasMatcher:
    def test_boundaries_and_longest_match(self):
        m = AliasMatcher(["alpha prime", "alpha prime 3", "lg-g5"])
        hits = list(m.find("see alpha prime 3 and xlg-g5x or lg-g5 ok"))
        assert ("alpha prime 3" in [h[2] for h in hits])
        # partial-word "xlg-g5x" must not match; standalone lg-g5 must
        assert [h for h in hits if h[2] == "lg-g5"] == [(33, 38, "lg-g5")]

    def test_accent_case_insensitive_offsets_original(self):
        m = AliasMatcher(["cafe de flore"])
        text = "at Café de Flore today"
        ((s, e, norm),) = list(m.find(text))
        assert text[s:e] == "Café de Flore" and norm == "cafe de flore"

    def test_cjk_no_boundaries(self):
        m = AliasMatcher(["南京南站"])
        assert [h[2] for h in m.find("今天在南京南站见")] == ["南京南站"]

    def test_stopword_filtered(self):
        m = AliasMatcher(["the", "the band"])
        assert [h[2] for h in m.find("the band played the song")] == ["the band"]


class TestAliasIndexStage:
    def test_dedup_and_normalize(self):
        ents = _ents([
            {"entity_id": "E1", "subject": "Dup Co",
             "aliases": ["dupalias", "dupalias", "Café"], "types": [], "infobox": []},
            {"entity_id": "E2", "subject": "Other",
             "aliases": ["café"], "types": [], "infobox": []},
        ])
        idx = build_alias_index(ray.data.from_arrow(ents)).to_pandas()
        pairs = set(map(tuple, idx[["norm_alias", "entity_id"]].itertuples(index=False)))
        assert pairs == {
            ("dupalias", "E1"), ("cafe", "E1"), ("dup co", "E1"),
            ("cafe", "E2"), ("other", "E2"),
        }
        d = collect_alias_dict(ray.data.from_arrow(ents))
        assert d["cafe"] == ["E1", "E2"]


class TestBlocking:
    def test_block_key_stable(self):
        t = pa.table({"norm_mention": ["a", "b", "a"]})
        out = add_block_key(t)
        ks = out["block_key"].to_pylist()
        assert ks[0] == ks[2] != ks[1]

    def test_lsh_band_rows_shape(self):
        t = pa.table({
            "doc_id": ["d1", "d2"], "span_idx": pa.array([0, 1], pa.int32()),
            "offset": pa.array([0, 5], pa.int32()),
            "norm_mention": ["hello world text", "hello world test"],
        })
        out = lsh_band_rows(t, num_perm=32, num_bands=8)
        assert out.num_rows == 16
        a = out.filter(pa.compute.equal(out["doc_id"], "d1"))["band_key"].to_pylist()
        b = out.filter(pa.compute.equal(out["doc_id"], "d2"))["band_key"].to_pylist()
        assert len(set(a) & set(b)) > 0  # near-dups share a band

    def test_hot_key_salting(self):
        rows = {"doc_id": [f"d{i}" for i in range(300)],
                "offset": pa.array(list(range(300)), pa.int32()),
                "norm_mention": ["hot"] * 250 + [f"cold{i}" for i in range(50)]}
        ds = ray.data.from_arrow(add_block_key(pa.table(rows)))
        hot = hot_keys(ds, cap=100)
        assert len(hot) == 1 and list(hot.values())[0] == 3
        salted = add_salted_key(add_block_key(pa.table(rows)), hot)
        tbl = salted.to_pandas()
        hot_rows = tbl[tbl.norm_mention == "hot"]
        assert hot_rows["salted_key"].nunique() == 3
        assert (hot_rows.groupby("salted_key").size() <= 150).all()
        cold = tbl[tbl.norm_mention != "hot"]
        assert (cold["salted_key"] == cold["block_key"]).all()


class TestAnn:
    def test_topk_tiebreak(self):
        scores = np.array([[1.0, 1.0, 0.5]], dtype=np.float32)
        ids = np.array(["B", "A", "C"], dtype=object)
        out_ids, out_scores = topk_ids(scores, ids, 2)
        assert out_ids[0].tolist() == ["A", "B"]

    def test_sharded_equals_broadcast(self):
        rng = np.random.default_rng(3)
        mat = rng.normal(size=(200, 16)).astype(np.float32)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        ids = np.array([f"E{i:04d}" for i in range(200)], dtype=object)
        q = rng.normal(size=(7, 16)).astype(np.float32)
        bi = BroadcastIndex((ids, mat))
        b_ids, b_scores = bi.search(q, 5)
        shards = build_shards(ids, mat, num_shards=4)
        s_ids, s_scores = sharded_topk(shards, q, 5)
        assert (b_ids == s_ids).all()
        assert np.allclose(b_scores, s_scores, atol=1e-5)

    def test_shard_save_load_roundtrip(self, tmp_path):
        """S14: serialized shards reload into a fresh actor pool and answer
        identically (reference faiss serialize/deserialize parity)."""
        from entity_linking_ray.stages.ann import load_shards, save_shards

        rng = np.random.default_rng(5)
        mat = rng.normal(size=(120, 8)).astype(np.float32)
        ids = np.array([f"E{i:04d}" for i in range(120)], dtype=object)
        q = rng.normal(size=(4, 8)).astype(np.float32)
        shards = build_shards(ids, mat, num_shards=3)
        want_ids, want_scores = sharded_topk(shards, q, 5)
        paths = save_shards(shards, str(tmp_path / "index"))
        assert len(paths) == 3
        reloaded = load_shards(paths)
        got_ids, got_scores = sharded_topk(reloaded, q, 5)
        assert (want_ids == got_ids).all()
        assert np.allclose(want_scores, got_scores, atol=1e-6)


class TestCandidates:
    def _kb(self):
        ents = _ents([
            {"entity_id": "E1", "subject": "Acme", "aliases": ["acme"], "types": [],
             "infobox": [{"predicate": "p", "object": "rockets anvils coyote"}]},
            {"entity_id": "E2", "subject": "Acme Two", "aliases": ["acme"], "types": [],
             "infobox": [{"predicate": "p", "object": "finance banking money"}]},
            {"entity_id": "E3", "subject": "Zed", "aliases": ["zed"], "types": [],
             "infobox": [{"predicate": "p", "object": "rockets anvils coyote"}]},
        ])
        return make_kb_blob(ents)

    def _mention(self, norm, left, right):
        return pa.table({
            "doc_id": ["d"], "span_idx": pa.array([0], pa.int32()),
            "mention": [norm], "norm_mention": [norm],
            "context_left": [left], "context_right": [right],
            "offset": pa.array([0], pa.int32()),
        })

    def test_exact_precedes_ann(self):
        gen = CandidateGenerator(self._kb(), k=3, ann_k=3)
        out = gen(self._mention("acme", "rockets anvils", "coyote stuff"))
        cands = out["cands"].to_pylist()[0]
        # both exact candidates first (E1, E2), then ANN backfill (E3 —
        # similar context) without duplicating exact ids (J8 precedence)
        assert [c["source"] for c in cands] == ["exact", "exact", "ann"]
        assert {c["entity_id"] for c in cands[:2]} == {"E1", "E2"}
        assert cands[2]["entity_id"] == "E3"

    def test_context_disambiguates_shared_alias(self):
        gen = CandidateGenerator(self._kb(), k=3, ann_k=0)
        out = gen(self._mention("acme", "finance banking", "money talk"))
        cands = out["cands"].to_pylist()[0]
        best = max(cands, key=lambda c: c["cosine"])
        assert best["entity_id"] == "E2"

    def test_hot_truncation_ranked_by_cosine(self):
        rows = [{"entity_id": f"E{i:02d}", "subject": f"S{i}", "aliases": ["hot"],
                 "types": [], "infobox": [{"predicate": "p", "object": f"tok{i} word{i}"}]}
                for i in range(20)]
        blob = make_kb_blob(_ents(rows))
        gen = CandidateGenerator(blob, k=5, ann_k=0)
        out = gen(self._mention("hot", "tok7", "word7"))
        cands = out["cands"].to_pylist()[0]
        assert len(cands) == 5
        assert cands[0]["entity_id"] == "E07" or max(
            cands, key=lambda c: c["cosine"])["entity_id"] == "E07"


def test_mention_extractor_media_and_empty():
    ext = MentionExtractor(["acme"])
    batch = pa.table({
        "doc_id": pa.array(["d1", "d2"], pa.string()),
        "spans": pa.array(
            [
                [{"kind": "image", "text": "", "media_ref": "m://1", "offset": 0},
                 {"kind": "text", "text": "acme here", "media_ref": "", "offset": 1}],
                [],
            ],
            pa.list_(schemas.SPAN_STRUCT)),
    })
    out = ext(batch)
    assert out.num_rows == 1
    assert out["offset"].to_pylist() == [1]
    assert out["span_idx"].to_pylist() == [1]


def test_score_and_link_all_nil_batch():
    """A batch where EVERY mention has zero candidates (empty KB hit set /
    ann_k=0) must early-return an all-NIL batch, not IndexError on the
    empty best-candidate gather."""
    from entity_linking_ray.stages.pairwise import score_and_link

    ents = _ents([
        {"entity_id": "E1", "subject": "Acme", "aliases": ["acme"], "types": [],
         "infobox": [{"predicate": "p", "object": "rockets"}]},
    ])
    gen = CandidateGenerator(make_kb_blob(ents), k=3, ann_k=0)
    mention = pa.table({
        "doc_id": ["d", "d"], "span_idx": pa.array([0, 1], pa.int32()),
        "mention": ["nohit", "misszz"], "norm_mention": ["nohit", "misszz"],
        "context_left": ["", ""], "context_right": ["", ""],
        "offset": pa.array([0, 9], pa.int32()),
    })
    cands = gen(mention)
    assert all(len(c) == 0 for c in cands["cands"].to_pylist())
    out = score_and_link(cands)
    assert out["entity_id"].to_pylist() == ["NIL", "NIL"]
    assert all(s < 0 for s in out["best_score"].to_pylist())
    # schema parity with the non-empty path: scored/ranked candidate struct
    names = [f.name for f in out.schema.field("cands").type.value_type]
    assert "score" in names and "rank" in names


class TestHashAliasMatcher:
    """Scale alias engine (multi-length Rabin-Karp) ≡ regex engine."""

    ALIASES = ["acme", "acme corp", "zed", "北京", "北京大学", "café",
               "a-1", "x9", "spark", "data lake"]
    TEXTS = [
        "Acme Corp bought ACME and zed; visit 北京大学 near 北京. café!",
        "sparky is not spark but spark is. data lake x9 a-1 b a-12 9x9",
        "",
        "北京北京大学acme",
        "the café caféx café.",
    ]

    def test_equivalence_on_edge_cases(self):
        from entity_linking_ray.stages.mentions import HashAliasMatcher

        rm = AliasMatcher(self.ALIASES)
        hm = HashAliasMatcher(self.ALIASES)
        for t in self.TEXTS:
            assert list(rm.find(t)) == list(hm.find(t)), t

    def test_equivalence_randomized(self):
        import random

        from entity_linking_ray.stages.mentions import HashAliasMatcher

        random.seed(11)
        vocab = ["ab", "abc", "abcd", "xy", "北", "北海", "q1w", "zz top", "é", "ér"]
        rm, hm = AliasMatcher(vocab), HashAliasMatcher(vocab)
        pieces = ["ab", "c", "d", " ", "abc", "xy", "北", "海", "q1w", "zz top", "é", "r", "1"]
        for _ in range(300):
            t = "".join(random.choice(pieces) for _ in range(random.randint(0, 40)))
            assert list(rm.find(t)) == list(hm.find(t)), repr(t)

    def test_gold_corpus_engine_equivalence(self):
        """The flagship extraction is engine-independent: identical mention
        tables from regex and hash engines on the gold corpus."""
        from entity_linking_ray.corpus import make_corpus

        c = make_corpus()
        ents = c["entities"]
        aliases = [a for al in ents["aliases"].to_pylist() for a in (al or [])]
        aliases += ents["subject"].to_pylist()
        batch = c["documents"]
        out_r = MentionExtractor(aliases, engine="regex")(batch)
        out_h = MentionExtractor(aliases, engine="hash")(batch)
        assert out_r.equals(out_h)

    def test_boundary_guard_and_big_dict(self):
        from entity_linking_ray.stages.mentions import HashAliasMatcher

        m = HashAliasMatcher([f"w{i:05d}" for i in range(20000)])
        got = m.find_batch(["xx w00123 yy w19999z w00000"])[0]
        # w19999z fails the trailing alnum guard
        assert got == [(3, 9, "w00123"), (21, 27, "w00000")]

    def test_auto_engine_selection(self):
        from entity_linking_ray.stages.mentions import HashAliasMatcher

        small = MentionExtractor(["acme"], engine="auto")
        big = MentionExtractor([f"w{i:05d}" for i in range(1000)], engine="auto")
        assert isinstance(small.matcher, AliasMatcher)
        assert isinstance(big.matcher, HashAliasMatcher)
