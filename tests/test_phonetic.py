"""Simplified-Soundex phonetic blocking keys — three-way parity:
vectorized Arrow kernel ≡ scalar reference ≡ the DuckDB oracle
expression, plus the fuzzy-join blocking integration."""

import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_linking_ray.functions.phonetic import (
    soundex, soundex_arrow, soundex_sql_expr)

KNOWN = {
    "Robert": "R163", "Rupert": "R163", "Ashcraft": "A226",
    "Ashcroft": "A226", "Tymczak": "T522", "Pfister": "P236",
    "Honeyman": "H555", "LLOYD": "L300", "Jackson": "J250",
    "": "000", "123": "000", "a": "A000", "AEIOU": "A000",
}


def test_soundex_known_values():
    assert {k: soundex(k) for k in KNOWN} == KNOWN


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(
    alphabet=st.sampled_from(list(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ äöüß'-09")),
    max_size=16), min_size=1, max_size=20))
def test_soundex_arrow_equals_scalar(names):
    got = soundex_arrow(pa.array(names, pa.string())).to_pylist()
    assert got == [soundex(s) for s in names]


def test_soundex_sql_expr_equals_scalar():
    names = list(KNOWN) + ["Müller", "o'brien", "van der Berg",
                           "bbbb", "xyzzy", "Wu", "Hsieh", "ng"]
    df = duckdb.sql(
        f"SELECT {soundex_sql_expr('s')} AS k "
        "FROM (SELECT unnest($1::VARCHAR[]) AS s)",
        params=[names]).df()
    assert df["k"].tolist() == [soundex(s) for s in names]


def test_soundex_arrow_sliced_and_chunked():
    arr = pa.array(["Robert", "Rupert", "Ashcraft", "LLOYD"])
    assert soundex_arrow(arr.slice(1, 2)).to_pylist() == ["R163", "A226"]
    ch = pa.chunked_array([["Robert"], ["", "Jackson"]])
    assert soundex_arrow(ch).to_pylist() == ["R163", "000", "J250"]


def test_fuzzy_pairs_soundex_last_token_block(ray_session):
    import ray.data

    from entity_linking_ray.stages.fuzzy import fuzzy_value_pairs

    # "smith"/"smyth" share a last-token soundex (S530) at distance 1;
    # "smith"/"stone" do not pair (distance 4); exact-token blocking
    # would have split smith/smyth into different blocks
    t = pa.table({"name": pa.array(
        ["alpha smith", "alpha smyth", "alpha stone", "beta smith"])})
    out = fuzzy_value_pairs(ray.data.from_arrow(t), col="name",
                            max_dist=2, block="soundex_last_token"
                            ).to_pandas()
    pairs = set(zip(out["name_a"], out["name_b"]))
    assert ("alpha smith", "alpha smyth") in pairs
    assert all("stone" not in a and "stone" not in b for a, b in pairs)
