"""Unit tests for the pure kernels (no Ray needed beyond the session)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_linking_ray.functions.describe import synthesize_description
from entity_linking_ray.functions.embed import cosine_matrix, embed_texts
from entity_linking_ray.functions.minhash import (
    band_keys, jaccard, minhash_signature, signature_matrix,
)
from entity_linking_ray.functions.normalize import normalize_array, normalize_str
from entity_linking_ray.functions.simhash import hamming64, simhash64
from entity_linking_ray.functions.strsim import (
    jaro_winkler, jaro_winkler_batch, levenshtein, levenshtein_ratio,
)


class TestNormalize:
    def test_accents_case_cjk(self):
        arr = pa.array(["Café  de Flore", "LG G5", "南京南站 高铁", "ÀÉÎÕÜ"])
        assert normalize_array(arr).to_pylist() == [
            "cafe de flore", "lg g5", "南京南站 高铁", "aeiou",
        ]

    @given(st.text(max_size=60))
    @settings(max_examples=200, deadline=None)
    def test_scalar_matches_vectorized(self, s):
        assert normalize_array(pa.array([s])).to_pylist() == [normalize_str(s)]


class TestStrsim:
    def test_known_values(self):
        assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-3)
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein_ratio("abc", "abc") == 1.0
        assert levenshtein_ratio("", "") == 1.0
        assert jaro_winkler("", "x") == 0.0

    def test_batch(self):
        out = jaro_winkler_batch(["abc", "南京南站"], ["abc", "南京站"])
        assert out[0] == 1.0 and 0.8 < out[1] < 1.0

    @given(st.text(max_size=20), st.text(max_size=20))
    @settings(max_examples=100, deadline=None)
    def test_symmetry_and_bounds(self, a, b):
        assert levenshtein(a, b) == levenshtein(b, a)
        assert 0.0 <= jaro_winkler(a, b) <= 1.0


class TestMinHash:
    def test_similarity_estimate(self):
        a = "the quick brown fox jumps over the lazy dog"
        b = "the quick brown fox jumped over the lazy dog"
        sa, sb = minhash_signature(a, 128), minhash_signature(b, 128)
        est = float((sa == sb).mean())
        assert abs(est - jaccard(a, b)) < 0.15

    def test_bands_collide_for_near_dups(self):
        M = signature_matrix([
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumped over the lazy dog",
            "completely different text entirely",
        ])
        bk = band_keys(M)
        assert (bk[0] == bk[1]).sum() > 0
        assert (bk[0] == bk[2]).sum() == 0

    def test_int64_range(self):
        bk = band_keys(signature_matrix(["hello world"]))
        assert bk.dtype == np.int64 and (bk >= 0).all()

    def test_deterministic(self):
        assert (minhash_signature("abc def") == minhash_signature("abc def")).all()


class TestSimHash:
    def test_near_vs_far(self):
        a = simhash64("the quick brown fox jumps over the lazy dog")
        b = simhash64("the quick brown fox jumped over the lazy dog")
        c = simhash64("alpha beta gamma delta epsilon")
        assert hamming64(np.array([a]), b)[0] < hamming64(np.array([a]), c)[0]

    def test_empty(self):
        assert simhash64("") == 0


class TestEmbed:
    def test_similar_texts_high_cosine(self):
        E = embed_texts(["apple banana cherry", "apple banana cherry date", "汽车 火车 高铁"])
        C = cosine_matrix(E, E)
        assert C[0, 1] > 0.7 and abs(C[0, 2]) < 0.3
        assert np.allclose(np.linalg.norm(E, axis=1), 1.0, atol=1e-5)

    def test_deterministic_and_boilerplate_invariant(self):
        a = embed_texts(["x y z"])
        b = embed_texts(["x y z x x x x"])  # binary bag: repeats don't matter
        assert np.allclose(a, b)


class TestDescribe:
    def test_fallback_and_budget(self):
        assert synthesize_description("X", []) == "摘要，X无描述信息。"
        assert synthesize_description("X", [{"predicate": "类型", "object": "车站"}]) == "类型，车站。"
        long = [{"predicate": "p", "object": "x" * 500}]
        assert len(synthesize_description("X", long, budget=100)) == 100
        many = [{"predicate": "p", "object": "y" * 30} for _ in range(20)]
        out = synthesize_description("X", many, budget=100)
        assert len(out) <= 100 and out.endswith("。")


def test_fingerprint_golden_values():
    """Golden determinism lock for the rows-only fingerprint operators
    (simhash_fingerprints / doc_fingerprints have no SQL oracle — DuckDB
    cannot express the 64-bit token hashing — so their scalar kernels are
    pinned to literal values instead; any change to hashing/tokenization
    shows up here before it silently changes query output)."""
    from entity_linking_ray.functions.simhash import simhash64
    from entity_linking_ray.functions.textstats import rolling_fingerprint

    golden = {
        "the quick brown fox": (4907584390286344473, 4202809647848709941),
        "entity linking at scale": (9801134690521003202, 2802245929444405660),
        "": (0, 0),
        "数据 处理 引擎": (13546528605080362044, 7954969928958178474),
        "a": (6857225946766476583, 3414815163700866188),
    }
    for text, (sh, fp) in golden.items():
        assert simhash64(text) == sh, text
        assert rolling_fingerprint(text) & 0x7FFFFFFFFFFFFFFF == fp, text


def test_morton2_bit_interleave():
    import numpy as np

    from entity_linking_ray.functions.layout import morton2

    a = np.array([0, 1, 2, 0xFFFF, 0x1234], np.int64)
    b = np.array([0, 1, 1, 0xFFFF, 0x00FF], np.int64)
    got = morton2(a, b)

    def ref(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got.tolist() == [ref(x, y) for x, y in zip(a, b)]
    # only the low 16 bits participate; result is always non-negative
    big = morton2(np.array([0x7FFF_FFFF_FFFF_FFFF], np.int64),
                  np.array([0x7FFF_FFFF_FFFF_FFFF], np.int64))
    assert big[0] == ref(0xFFFF, 0xFFFF) and big[0] >= 0


class TestBulkFnv:
    """The vectorized FNV-1a kernel must be bit-identical to the scalar
    twin (these hashes are pinned in DuckDB oracles)."""

    def _ref(self, strings, seed=0):
        import numpy as np

        from entity_linking_ray.functions.hashing import fnv1a_64

        out = np.empty(len(strings), dtype=np.int64)
        s64 = (seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        for i, s in enumerate(strings):
            out[i] = (fnv1a_64(s.encode("utf-8")) ^ s64) & 0x7FFFFFFFFFFFFFFF
        return out

    @given(st.lists(st.text(max_size=200), max_size=60),
           st.integers(min_value=0, max_value=7))
    @settings(max_examples=60, deadline=None)
    def test_hash_strings_matches_scalar(self, strings, seed):
        import numpy as np

        from entity_linking_ray.functions.hashing import hash_strings

        assert np.array_equal(hash_strings(strings, seed),
                              self._ref(strings, seed))

    @given(st.lists(st.text(max_size=200), max_size=60))
    @settings(max_examples=40, deadline=None)
    def test_hash_strings_arrow_matches_scalar(self, strings):
        import numpy as np
        import pyarrow as pa

        from entity_linking_ray.functions.hashing import hash_strings_arrow

        assert np.array_equal(hash_strings_arrow(pa.array(strings, pa.string())),
                              self._ref(strings))
        assert np.array_equal(
            hash_strings_arrow(pa.array(strings, pa.large_string())),
            self._ref(strings))

    def test_arrow_slice_and_long_tail(self):
        import numpy as np
        import pyarrow as pa

        from entity_linking_ray.functions.hashing import hash_strings_arrow

        # one huge string among many small ones exercises the scalar tail;
        # a sliced array exercises non-zero buffer offsets
        vals = ["x" * 50_000] + [f"s{i}" for i in range(100)]
        arr = pa.array(vals).slice(0, 80)
        assert np.array_equal(hash_strings_arrow(arr), self._ref(vals[:80]))
