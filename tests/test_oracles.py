"""Direct DuckDB-vs-Python parity of the oracle hash primitives
(entity_linking_ray/oracles.py): the er_* exact oracles pin these
end-to-end; this pins each primitive in isolation so drift is
attributed immediately."""

import random

import duckdb
import numpy as np
import pytest

from entity_linking_ray.functions.hashing import fnv1a_64, splitmix64
from entity_linking_ray.oracles import MASK63, fnv1a_sql, mul64


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_mul64_matches_mod_2_64(con):
    rng = random.Random(7)
    for _ in range(50):
        a, b = rng.getrandbits(64), rng.getrandbits(64)
        got = con.execute(
            f"SELECT {mul64(f'{a}::UBIGINT', f'{b}::UBIGINT')}").fetchone()[0]
        assert int(got) == (a * b) % 2 ** 64


def test_fnv1a_sql_matches_python(con):
    for s in ["", "0", "doc-00000042", "e|T00013", "59999",
              "spark customer merge", "a" * 64]:
        got = con.execute("SELECT " + fnv1a_sql(f"'{s}'")).fetchone()[0]
        assert int(got) == fnv1a_64(s.encode()), s


def test_splitmix_stage_chain_matches_python(con):
    """The staged CTE splitmix (splitmix_stages) — checked through the
    same expression shape the oracles use."""
    from entity_linking_ray.oracles import SM_ADD, SM_MUL1, SM_MUL2, _MOD

    def sm_sql(x):
        z0 = f"CAST((CAST(({x}) AS HUGEINT) + {SM_ADD}) % {_MOD} AS UBIGINT)"
        t1 = f"xor({z0}, {z0} >> 30)"
        t1m = mul64(t1, SM_MUL1)
        t2m = mul64(f"xor({t1m}, {t1m} >> 27)", SM_MUL2)
        return f"xor({t2m}, {t2m} >> 31)"

    vals = [0, 1, 777, 12345678901234567890, 2 ** 64 - 1]
    exp = splitmix64(np.array(vals, dtype=np.uint64))
    for v, e in zip(vals, exp):
        got = con.execute(f"SELECT {sm_sql(f'{v}::UBIGINT')}").fetchone()[0]
        assert int(got) == int(e), v


def test_mask63_is_63_bits():
    assert int(MASK63) == 0x7FFFFFFFFFFFFFFF
