"""Dedup suite: exact, MinHash-LSH, SimHash, embedding near-dup — on small
synthetic inputs with planted duplicates."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from entity_linking_ray.stages.dedup import (
    embedding_dup_pairs, exact_dedup, lsh_candidate_pairs, minhash_band_rows,
    minhash_dedup, simhash_dup_pairs, simhash_fingerprints,
)

BASE = "the quick brown fox jumps over the lazy dog while the rain falls on the plain"


def _docs():
    rows = [
        {"doc_id": "d0", "text": BASE},
        {"doc_id": "d1", "text": BASE},  # exact dup of d0
        {"doc_id": "d2", "text": BASE.replace("jumps", "jumped")},  # near-dup
        {"doc_id": "d3", "text": "completely different content about databases and queries"},
        {"doc_id": "d4", "text": BASE.replace("rain", "snow")},  # near-dup chain
        {"doc_id": "d5", "text": ""},
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_exact_dedup_keeps_min_id():
    out = exact_dedup(_docs()).to_pandas().sort_values("doc_id")
    assert "d1" not in set(out["doc_id"])  # dup of d0 dropped
    assert {"d0", "d2", "d3", "d4", "d5"} == set(out["doc_id"])


def test_lsh_pairs_find_near_dups_not_distinct():
    pairs = lsh_candidate_pairs(_docs(), jaccard_threshold=0.5).to_pandas()
    got = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert ("d0", "d1") in got
    assert ("d0", "d2") in got
    assert not any("d3" in p for p in got)


def test_lsh_pairs_join_mode_equivalent():
    """pair_mode="join" (the 100-TB path: signatures join back per pair,
    no driver pair list) yields the same verified pair set and estimates
    as the broadcast path."""
    b = lsh_candidate_pairs(_docs(), jaccard_threshold=0.5,
                            pair_mode="broadcast").to_pandas()
    j = lsh_candidate_pairs(_docs(), jaccard_threshold=0.5,
                            pair_mode="join", num_partitions=2).to_pandas()
    key = lambda df: df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b, j = key(b), key(j[b.columns])
    assert b[["id_a", "id_b"]].equals(j[["id_a", "id_b"]])
    assert np.allclose(b["est_jaccard"], j["est_jaccard"])


def test_band_rows_are_slim():
    """The band shuffle must not carry the full signature payload — only
    the 8-byte band key, the id, and the 16-byte b-bit sketch."""
    schema = minhash_band_rows(_docs()).schema()
    assert sorted(schema.names) == ["__sk0", "__sk1", "band_key", "doc_id"]


def test_minhash_dedup_removes_cluster_losers():
    out = minhash_dedup(_docs(), jaccard_threshold=0.5).to_pandas()
    ids = set(out["doc_id"])
    assert "d0" in ids and "d3" in ids and "d5" in ids
    # d1/d2/d4 all cluster with d0 (transitively) and are dropped
    assert ids.isdisjoint({"d1", "d2", "d4"})


def test_minhash_dedup_keyed_join_equivalent():
    """winner_mode="join" (the 100-TB path: no driver component map / loser
    set) keeps exactly the same survivors as the broadcast path."""
    broadcast = minhash_dedup(_docs(), jaccard_threshold=0.5,
                              winner_mode="broadcast").to_pandas()
    joined = minhash_dedup(_docs(), jaccard_threshold=0.5,
                           winner_mode="join", num_partitions=2).to_pandas()
    assert set(joined["doc_id"]) == set(broadcast["doc_id"])
    assert sorted(joined.columns) == sorted(broadcast.columns)
    # and the rows themselves survive untouched
    b = broadcast.sort_values("doc_id").reset_index(drop=True)
    j = joined.sort_values("doc_id").reset_index(drop=True)[b.columns]
    assert b.equals(j)


def test_simhash_pairs():
    fps = simhash_fingerprints(_docs()).to_pandas()
    assert len(fps) == 6 and fps["simhash"].dtype == np.int64
    pairs = simhash_dup_pairs(_docs(), max_hamming=6).to_pandas()
    got = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert ("d0", "d1") in got
    assert not any("d3" in p and ("d0" in p or "d1" in p) for p in got)


def test_embedding_dup_pairs_finds_planted():
    rng = np.random.default_rng(5)
    base = rng.normal(size=8)
    rows = []
    for i in range(20):
        v = rng.normal(size=8)
        rows.append({"vec_id": i, "embedding": list(map(float, v))})
    rows.append({"vec_id": 100, "embedding": list(map(float, base))})
    rows.append({"vec_id": 101, "embedding": list(map(float, base + rng.normal(size=8) * 0.01))})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = embedding_dup_pairs(ds, cosine_threshold=0.98).to_pandas()
    got = {tuple(sorted(map(int, p))) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert (100, 101) in got


def test_embedding_dup_pairs_planted_duplicates():
    """Planted near-duplicate vectors MUST surface: multi-band SRP-LSH
    output equals the exact all-pairs answer on this fixture (miss
    probability ~1e-6 per pair at cos≈0.99 with 16 bands x 8 planes,
    deterministic given the fixed planes)."""
    import numpy as np

    from entity_linking_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.default_rng(99)
    base = rng.normal(size=(120, 32))
    planted = []
    vecs = list(base)
    for i in range(10):  # ten near-dup pairs: tiny perturbation of a base row
        v = base[i] + rng.normal(scale=0.02, size=32)
        planted.append((i, len(vecs)))
        vecs.append(v)
    V = np.stack(vecs)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn @ Vn.T
    iu, ju = np.triu_indices(len(V), k=1)
    exact = {(int(i), int(j)) for i, j in zip(iu[C[iu, ju] >= 0.95], ju[C[iu, ju] >= 0.95])}
    assert len(exact) >= 10  # all planted pairs qualify

    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(V)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32())),
    }))
    got = embedding_dup_pairs(ds, cosine_threshold=0.95).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    assert got_pairs == exact


def test_embedding_dup_pairs_join_mode_equivalent():
    """The fully distributed join-back path (pair_mode='join', the 100-TB
    shape: band shuffle carries only (bucket, id, sketch) and vectors come
    back via two hash joins) must produce exactly the broadcast answer."""
    import numpy as np

    from entity_linking_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 16))
    vecs = list(base)
    for i in range(5):
        vecs.append(base[i] + rng.normal(scale=0.02, size=16))
    V = np.stack(vecs)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(V)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32())),
    }))
    bc = embedding_dup_pairs(ds, cosine_threshold=0.95,
                             pair_mode="broadcast").to_pandas()
    jn = embedding_dup_pairs(ds, cosine_threshold=0.95,
                             pair_mode="join").to_pandas()
    pb = {(int(a), int(b)) for a, b in zip(bc["id_a"], bc["id_b"])}
    pj = {(int(a), int(b)) for a, b in zip(jn["id_a"], jn["id_b"])}
    assert pb == pj and len(pb) >= 5


def _jac_docs():
    """Docs with planted near-dups plus heavy shared boilerplate — the
    boilerplate makes hash-ordered prefixes degenerate, so this doubles as
    a regression test for the df-ordered prefix (all-pairs) blocking."""
    import numpy as np

    rng = np.random.default_rng(11)
    boiler = "terms of service apply to all content on this page "
    rows = []
    for i in range(40):
        body = " ".join(f"w{rng.integers(0, 5000)}" for _ in range(60))
        rows.append({"doc_id": i, "text": boiler + body})
    # planted near-dups: single-word edits of docs 0..4
    for j in range(5):
        t = rows[j]["text"].split()
        t[-1] = "edited"
        rows.append({"doc_id": 100 + j, "text": " ".join(t)})
    rows.append({"doc_id": 999, "text": ""})
    return rows


def _exact_jaccard_pairs(rows, k=3, t=0.7):
    out = {}
    sets = {}
    for r in rows:
        w = r["text"].split()
        if len(w) >= k:
            sets[r["doc_id"]] = {" ".join(w[i:i + k])
                                 for i in range(len(w) - k + 1)}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter >= t * union:
                out[(a, b)] = (inter, union)
    return out


def test_ngram_jaccard_exact_pairs_and_counts():
    from entity_linking_ray.stages.dedup import ngram_jaccard_dup_pairs

    rows = _jac_docs()
    want = _exact_jaccard_pairs(rows)
    assert len(want) >= 5  # the planted pairs
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    got = ngram_jaccard_dup_pairs(ds, threshold=0.7).to_pandas()
    got_map = {(int(a), int(b)): (int(i), int(u)) for a, b, i, u in
               zip(got["id_a"], got["id_b"], got["n_inter"], got["n_union"])}
    # identical pair set AND identical integer set cardinalities
    # (hash-invariant: 63-bit shingle hashes collide with prob ~0)
    assert got_map == want


def test_ngram_jaccard_join_mode_equivalent():
    from entity_linking_ray.stages.dedup import ngram_jaccard_dup_pairs

    ds = ray.data.from_arrow(pa.Table.from_pylist(_jac_docs()))
    bc = ngram_jaccard_dup_pairs(ds, threshold=0.7, pair_mode="broadcast").to_pandas()
    jn = ngram_jaccard_dup_pairs(ds, threshold=0.7, pair_mode="join",
                                 num_partitions=2).to_pandas()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b", "n_inter", "n_union"]]
                                .itertuples(index=False)))
    assert key(bc) == key(jn) and len(bc) >= 5


def test_ngram_jaccard_no_dups_returns_typed_empty():
    from entity_linking_ray.stages.dedup import ngram_jaccard_dup_pairs

    rows = [{"doc_id": i, "text": f"totally unique number {i} " * 3}
            for i in range(6)]
    out = ngram_jaccard_dup_pairs(
        ray.data.from_arrow(pa.Table.from_pylist(rows)), threshold=0.9)
    assert out.schema().names == ["id_a", "id_b", "n_inter", "n_union"]
    assert out.count() == 0


def test_dedup_new_against_corpus(ray_session):
    import numpy as np

    from entity_linking_ray.stages.dedup import dedup_new_against_corpus

    rng = np.random.default_rng(31)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    # wide vocab so RANDOM docs share few char shingles (a 10-word vocab
    # makes everything a near-dup of everything at the 5-gram level)
    vocab = ["".join(rng.choice(letters, 8)) for _ in range(500)]

    def doc(seed, n=40):
        r = np.random.default_rng(seed)
        return " ".join(vocab[i] for i in r.integers(0, len(vocab), n))

    corpus_texts = [doc(i) for i in range(30)]
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([f"old{i}" for i in range(30)]),
        "text": pa.array(corpus_texts),
    })).repartition(4)

    exact_dup = corpus_texts[3]                      # byte-identical
    words = corpus_texts[7].split()
    words[0] = vocab[0]                              # near-dup of old7
    near_dup = " ".join(words)
    fresh = [doc(1000 + i) for i in range(5)]
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["n_exact", "n_near"] + [f"n{i}" for i in range(5)]),
        "text": pa.array([exact_dup, near_dup] + fresh),
    })).repartition(3)

    out = dedup_new_against_corpus(new, corpus, jaccard_threshold=0.7)
    kept = sorted(out.to_pandas()["doc_id"])
    assert "n_exact" not in kept            # exact pass caught it
    assert "n_near" not in kept             # near pass caught it
    assert kept == sorted(f"n{i}" for i in range(5))

    # exact-only mode keeps the near-dup
    out2 = dedup_new_against_corpus(new, corpus, near=False)
    assert "n_near" in set(out2.to_pandas()["doc_id"])
    # old-old dups never appear anywhere: output only contains new ids
    assert all(k.startswith("n") for k in kept)


def test_dedup_new_against_corpus_join_mode_matches_broadcast(ray_session):
    """pair_mode='join' (the 100-TB path that replaced the hard cap
    failure) must keep exactly the same new docs as the broadcast verify."""
    import numpy as np

    from entity_linking_ray.stages.dedup import dedup_new_against_corpus

    rng = np.random.default_rng(77)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = ["".join(rng.choice(letters, 8)) for _ in range(500)]

    def doc(seed, n=40):
        r = np.random.default_rng(seed)
        return " ".join(vocab[i] for i in r.integers(0, len(vocab), n))

    corpus_texts = [doc(i) for i in range(25)]
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([f"old{i}" for i in range(25)]),
        "text": pa.array(corpus_texts),
    })).repartition(4)

    words = corpus_texts[5].split()
    words[1] = vocab[1]
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["n_exact", "n_near", "n_fresh0", "n_fresh1"]),
        "text": pa.array([corpus_texts[2], " ".join(words),
                          doc(2000), doc(2001)]),
    })).repartition(2)

    kept_b = sorted(dedup_new_against_corpus(
        new, corpus, jaccard_threshold=0.7,
        pair_mode="broadcast").to_pandas()["doc_id"])
    kept_j = sorted(dedup_new_against_corpus(
        new, corpus, jaccard_threshold=0.7,
        pair_mode="join", num_partitions=4).to_pandas()["doc_id"])
    assert kept_b == kept_j == ["n_fresh0", "n_fresh1"]


def test_ngram_jaccard_token_overflow_fails_loudly(ray_session):
    """A prefix token shared by more docs than max_docs_per_token must
    raise (recall-1 contract), and 'truncate' must run through."""
    import pytest as _pytest

    from entity_linking_ray.stages.dedup import ngram_jaccard_dup_pairs

    # every doc shares the same three words -> one prefix token in all of
    # them; hh_min_df high so no df reordering rescues selectivity
    rows = [{"doc_id": i, "text": f"alpha beta gamma tail{i} end{i}"}
            for i in range(8)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    # threshold 0.1 -> every shingle is a prefix token, so the shared
    # "alpha beta gamma" gram's posting list is all 8 docs > the cap of 4
    with _pytest.raises(ValueError, match="posting lists over"):
        ngram_jaccard_dup_pairs(ds, threshold=0.1, shingle_k=3,
                                hh_min_df=100, max_docs_per_token=4).count()
    out = ngram_jaccard_dup_pairs(ds, threshold=0.1, shingle_k=3,
                                  hh_min_df=100, max_docs_per_token=4,
                                  on_token_overflow="truncate")
    out.count()  # runs; recall claim is explicitly waived


def test_survivorship_argmax_and_tiebreak(ray_session):
    """Canonical = max rank, tie -> min id; group size exact across
    partitions (the combiner must not double-count)."""
    import pyarrow as pa

    from entity_linking_ray.stages.dedup import survivorship

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(["x", "x", "x", "y", "y", "z"]),
        "n_chars": pa.array([5, 9, 9, 4, 4, 7], pa.int64()),
    })
    out = (survivorship(ray.data.from_arrow(t).repartition(4))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # x: max n_chars 9 tie -> doc 2; y: tie at 4 -> doc 4; z singleton
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (2, 9, 3), (4, 4, 2), (6, 7, 1)]


def test_containment_pairs_semantics():
    """Planted containment, bidirectional equality, sub-window exclusion,
    and no false positives."""
    from entity_linking_ray.stages.dedup import containment_pairs

    base = "the fast key order sort table scan part small join batch dup"
    rows = {
        1: base + " group row data slow",          # container
        2: base,                                    # contained in 1 (prefix)
        3: "value agg column big " + base,          # also contains 2 (suffix)
        4: "filter line value agg column big small join batch dup group row",
        5: base,                                    # identical to 2 → both ways
        6: "short text only",                       # < w tokens: out of scope
    }
    t = pa.table({"doc_id": pa.array(list(rows), pa.int64()),
                  "text": pa.array(list(rows.values()), pa.string())})
    out = containment_pairs(ray.data.from_arrow(t)).to_pandas()
    got = {(r.id_contained, r.id_container) for r in out.itertuples()}
    assert (2, 1) in got and (2, 3) in got
    assert (5, 1) in got and (5, 3) in got
    assert (2, 5) in got and (5, 2) in got          # identical texts: both ways
    assert all(a != b for a, b in got)
    assert not any(6 in p for p in got)             # sub-window doc excluded
    assert (4, 1) not in got and (1, 4) not in got  # unrelated: no false pair


def test_containment_pairs_string_ids(ray_session):
    """The operator-family contract: doc ids may be strings (like
    line_dedup/minhash_dedup); ids round-trip untouched."""
    from entity_linking_ray.stages.dedup import containment_pairs

    base = "the fast key order sort table scan part small join batch dup"
    t = pa.table({"doc_id": pa.array(["d-big", "d-small"], pa.string()),
                  "text": pa.array([base + " extra tail words", base])})
    out = containment_pairs(ray.data.from_arrow(t)).to_pandas()
    got = {(r.id_contained, r.id_container) for r in out.itertuples()}
    assert got == {("d-small", "d-big")}


def test_containment_pairs_no_candidates_typed_empty(ray_session):
    """Zero candidates → typed empty out, and the corpus text is never
    collected (the verify stage is skipped entirely)."""
    from entity_linking_ray.stages.dedup import containment_pairs

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b c d e f g h i j k",
                          "z y x w v u t s r q p"])})
    out = containment_pairs(ray.data.from_arrow(t))
    assert out.count() == 0
    assert out.schema() is not None
    assert set(out.schema().names) == {"id_contained", "id_container"}


def _semdedup_fixture(n=80, d=16, n_dups=8, seed=7):
    """n base vectors + n_dups tiny perturbations (planted semantic dups)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d))
    vecs = list(base)
    for i in range(n_dups):
        vecs.append(base[i] + rng.normal(scale=0.01, size=d))
    V = np.stack(vecs)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(V)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32())),
    }))
    return V, ds


def test_semdedup_pairs_sound_and_within_cluster(ray_session):
    """Every emitted pair must (a) exceed the cosine threshold under the
    exact all-pairs computation and (b) appear at most once with
    id_a < id_b — soundness; the planted near-identical pairs land in
    the same cluster (cosine ≈ 1 → same argmax centroid) so recall on
    the planted set is exact."""
    from entity_linking_ray.stages.dedup import semdedup_pairs

    V, ds = _semdedup_fixture()
    # float32 storage quantizes the vectors: compare against the stored
    # values, exactly as the operator sees them
    V32 = np.stack([np.asarray(v, np.float32).astype(np.float64) for v in V])
    Vn = V32 / np.linalg.norm(V32, axis=1, keepdims=True)
    C = Vn @ Vn.T
    got = semdedup_pairs(ds, k=4, cosine_threshold=0.9).to_pandas()
    assert (got["id_a"] < got["id_b"]).all()
    assert not got.duplicated(subset=["id_a", "id_b"]).any()
    for a, b in zip(got["id_a"], got["id_b"]):
        assert C[int(a), int(b)] >= 0.9
    planted = {(i, 80 + i) for i in range(8)}
    got_pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    assert planted <= got_pairs


def test_semdedup_pairs_partition_invariant(ray_session):
    """Bit-identical output no matter how the input is blocked (the
    pinnability argument: exact fixed-point k-means + id-sorted groups)."""
    from entity_linking_ray.stages.dedup import semdedup_pairs

    _, ds = _semdedup_fixture()
    a = (semdedup_pairs(ds, k=4, cosine_threshold=0.9).to_pandas()
         .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    b = (semdedup_pairs(ds.repartition(7), k=4, cosine_threshold=0.9)
         .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert a.equals(b)


def test_semdedup_keep_drops_component_losers(ray_session):
    """Keep-set = all rows minus non-min members of each pair-graph
    component (computed brute-force here), with the vector column intact
    after its binary pack/unpack ride through the anti join."""
    import pandas as pd

    from entity_linking_ray.stages.dedup import semdedup, semdedup_pairs

    V, ds = _semdedup_fixture()
    pairs = semdedup_pairs(ds, k=4, cosine_threshold=0.9).to_pandas()
    # brute union-find over the pair graph
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), set()).add(x)
    losers = set()
    for members in comp.values():
        losers |= members - {min(members)}

    kept = semdedup(ds, k=4, cosine_threshold=0.9,
                    num_partitions=2).to_pandas()
    assert set(kept["vec_id"]) == set(range(len(V))) - losers
    # vectors survive the pack/unpack round trip losslessly (float32)
    row = kept[kept["vec_id"] == 0].iloc[0]
    np.testing.assert_array_equal(
        np.asarray(row["embedding"], np.float32),
        np.asarray(V[0], np.float32))


def test_semdedup_winner_modes_equivalent(ray_session):
    """broadcast and join winner paths keep the identical row set (the
    minhash_dedup equivalence contract, extended to semdedup), and the
    vector column survives both (untouched in broadcast, pack/unpack in
    join)."""
    from entity_linking_ray.stages.dedup import semdedup

    V, ds = _semdedup_fixture()
    bc = semdedup(ds, k=4, cosine_threshold=0.9,
                  winner_mode="broadcast").to_pandas()
    jn = semdedup(ds, k=4, cosine_threshold=0.9, winner_mode="join",
                  num_partitions=2).to_pandas()
    assert set(bc["vec_id"]) == set(jn["vec_id"])
    assert len(bc) == len(jn)
    for df in (bc, jn):
        row = df[df["vec_id"] == 0].iloc[0]
        np.testing.assert_array_equal(
            np.asarray(row["embedding"], np.float32),
            np.asarray(V[0], np.float32))


def test_semdedup_join_mode_preserves_float64(ray_session):
    """join mode's pack/unpack must round-trip the column's OWN dtype:
    a float64 corpus comes back float64 and byte-identical (a fixed
    float32 pack would silently truncate)."""
    from entity_linking_ray.stages.dedup import semdedup

    V, _ = _semdedup_fixture()
    ds64 = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(V)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float64())),
    }))
    jn = semdedup(ds64, k=4, cosine_threshold=0.9, winner_mode="join",
                  num_partitions=2).to_pandas()
    row = jn[jn["vec_id"] == 0].iloc[0]
    arr = np.asarray(row["embedding"])
    assert arr.dtype == np.float64
    np.testing.assert_array_equal(arr, V[0])  # exact, not approx


def test_semdedup_pairs_no_dups_typed_empty(ray_session):
    """Far-apart vectors → zero pairs, and the result still carries the
    (id_a, id_b, cid) schema (typed-empty contract)."""
    from entity_linking_ray.stages.dedup import semdedup_pairs

    rng = np.random.default_rng(3)
    V = rng.normal(size=(12, 16))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(12), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32())),
    }))
    out = semdedup_pairs(ds, k=2, cosine_threshold=0.999)
    assert out.count() == 0
    assert set(out.schema().names) == {"id_a", "id_b", "cid"}


# ---------------------------------------------------------------------------
# Line-level boilerplate dedup
# ---------------------------------------------------------------------------


def _line_docs():
    rows = [
        {"doc_id": "d1", "text": "unique alpha\nFOOTER\nbody one"},
        {"doc_id": "d2", "text": "unique beta\nFOOTER\nbody two"},
        {"doc_id": "d3", "text": "FOOTER"},            # all lines dropped
        {"doc_id": "d4", "text": ""},                   # one unique empty line
        {"doc_id": "d5", "text": "twice\ntwice\nkeep"},  # in-doc repeat counts
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_line_dedup_semantics(ray_session):
    from entity_linking_ray.stages.dedup import line_dedup

    out = {r["doc_id"]: r for r in
           line_dedup(_line_docs(), min_count=2).take_all()}
    assert out["d1"]["clean_text"] == "unique alpha\nbody one"
    assert out["d1"]["kept_lines"] == 2 and out["d1"]["dropped_lines"] == 1
    assert out["d2"]["clean_text"] == "unique beta\nbody two"
    # every line duplicated -> doc survives with empty clean_text
    assert out["d3"]["clean_text"] == "" and out["d3"]["kept_lines"] == 0
    # the empty line appears once corpus-wide -> kept
    assert out["d4"]["kept_lines"] == 1 and out["d4"]["clean_text"] == ""
    # within-doc repetition counts toward the corpus total
    assert out["d5"]["clean_text"] == "keep"
    assert out["d5"]["dropped_lines"] == 2


def test_line_dedup_paths_equivalent(ray_session):
    from entity_linking_ray.stages.dedup import line_dedup

    def canon(ds):
        return sorted((r["doc_id"], r["kept_lines"], r["dropped_lines"],
                       r["clean_text"]) for r in ds.take_all())

    a = canon(line_dedup(_line_docs(), mode="broadcast"))
    b = canon(line_dedup(_line_docs(), mode="join"))
    assert a == b and len(a) == 5


def test_line_dedup_no_dups_passthrough(ray_session):
    from entity_linking_ray.stages.dedup import line_dedup

    docs = ray.data.from_arrow(pa.Table.from_pylist(
        [{"doc_id": "a", "text": "one\ntwo"},
         {"doc_id": "b", "text": "three"}]))
    out = {r["doc_id"]: r for r in line_dedup(docs).take_all()}
    assert out["a"]["clean_text"] == "one\ntwo"
    assert out["b"]["clean_text"] == "three"
    assert all(r["dropped_lines"] == 0 for r in out.values())


def test_line_dedup_typed_empty(ray_session):
    from entity_linking_ray.stages.dedup import line_dedup

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    out = line_dedup(empty)
    schema = out.schema()
    assert schema is not None
    assert set(schema.names) == {"doc_id", "kept_lines", "dropped_lines",
                                 "clean_text"}
    assert out.count() == 0


def test_dup_substring_spans_modes_match_bruteforce(ray_session):
    """Both plans (broadcast probe / slim semi-join) equal an exact
    brute-force window-count reference, including self-repeats and the
    typed-empty contract."""
    import numpy as np
    import pyarrow as pa

    from entity_linking_ray.stages.dedup import dup_substring_spans

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = []
    for i in range(60):
        body = " ".join(rng.choice(words, rng.integers(5, 60)))
        if i % 3 == 0:
            body = body[:20] + boiler + body[20:]
        if i % 7 == 0:
            body = body + body[:50]  # in-doc repeat
        docs.append(body)
    t = pa.table({"doc_id": pa.array([f"d{i:03d}" for i in range(60)]),
                  "text": pa.array(docs)})
    W, MC = 30, 2
    from collections import Counter

    cnt = Counter()
    for d in docs:
        for p in range(len(d) - W + 1):
            cnt[d[p:p + W]] += 1
    ref = []
    for i, d in enumerate(docs):
        spans, prev = [], None
        for p in range(len(d) - W + 1):
            if cnt[d[p:p + W]] < MC:
                continue
            if prev is None or p - prev > W:
                spans.append([p, p + W])
            else:
                spans[-1][1] = p + W
            prev = p
        ref += [(f"d{i:03d}", s, e) for s, e in spans]
    ref = sorted(ref)
    assert len(ref) > 10  # the fixture actually exercises the operator

    ds = ray.data.from_arrow(t).repartition(4)
    for mode in ("broadcast", "join"):
        got = dup_substring_spans(ds, window=W, min_count=MC,
                                  mode=mode).to_pandas()
        assert sorted(zip(got.doc_id, got.span_start,
                          got.span_end)) == ref, mode

    # unicode parity: positions are CHARACTER offsets (byte offsets
    # would shift every span on these multibyte texts — the brute-force
    # reference below indexes Python strings, i.e. characters)
    udocs = ["αβγ unique-one héllo wörld× tail",
             "ζη another-doc héllo wörld× end×"]
    Wu = 12
    ucnt = Counter()
    for d in udocs:
        for p in range(len(d) - Wu + 1):
            ucnt[d[p:p + Wu]] += 1
    uref = []
    for i, d in enumerate(udocs):
        spans, prev = [], None
        for p in range(len(d) - Wu + 1):
            if ucnt[d[p:p + Wu]] < 2:
                continue
            if prev is None or p - prev > Wu:
                spans.append([p, p + Wu])
            else:
                spans[-1][1] = p + Wu
            prev = p
        uref += [(f"u{i}", s, e) for s, e in spans]
    assert uref  # the shared ' héllo wörld×' region really is flagged
    u = pa.table({"doc_id": pa.array(["u0", "u1"]),
                  "text": pa.array(udocs)})
    got = dup_substring_spans(ray.data.from_arrow(u), window=Wu,
                              min_count=2, mode="broadcast").to_pandas()
    assert sorted(zip(got.doc_id, got.span_start,
                      got.span_end)) == sorted(uref)

    # typed empty out for empty in
    empty = ray.data.from_arrow(t.slice(0, 0))
    out = dup_substring_spans(empty, window=W, min_count=MC)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "span_start", "span_end"}


def test_dedup_new_against_corpus_all_exact_dups(ray_session):
    """Nightly re-crawl degenerate case: EVERY new doc byte-duplicates
    the corpus. Pass 1 leaves only empty (zero-column) join blocks,
    which drop_empty_blocks cannot scrub — the short-circuit must
    return a TYPED empty (new schema, 0 rows), not crash the band join."""
    from entity_linking_ray.stages.dedup import dedup_new_against_corpus

    texts = [f"the quick brown fox number {i} jumps over the lazy dog "
             f"while counting {i * 7} stars" for i in range(8)]
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([f"old{i}" for i in range(8)]),
        "text": pa.array(texts),
    })).repartition(3)
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([f"new{i}" for i in range(4)]),
        "text": pa.array(texts[:4]),
    })).repartition(2)

    out = dedup_new_against_corpus(new, corpus, jaccard_threshold=0.7)
    assert out.count() == 0
    sch = out.schema()
    assert sch is not None and set(sch.names) == {"doc_id", "text"}
