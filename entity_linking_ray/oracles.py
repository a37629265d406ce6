"""DuckDB oracle-SQL builders for the hash-bearing flagship queries.

The flagship's mention node ids and cluster labels are 63-bit FNV-1a /
splitmix64 hashes (functions/hashing.py, stages/pairwise.py:106).  DuckDB
has no native 64-bit wrapping arithmetic (BIGINT overflow raises), so the
builders below emit SQL that emulates mod-2^64 arithmetic through HUGEINT
partial products — making the full link-and-cluster path value-hash
checkable end-to-end under the driver protocol:

- ``mul64(a, b)``: (a*b) mod 2^64 via the 32-bit split
  (a_lo*b mod 2^64) + ((a_hi*b mod 2^32) << 32); every partial fits in
  HUGEINT (≤ 2^96 < 2^127).
- ``fnv1a_sql(expr)``: FNV-1a 64 over the string's bytes (ASCII inputs
  here, so ``ord`` per char == the UTF-8 byte) via list_reduce.
- ``splitmix_stages``: the splitmix64 finalizer, staged across chained
  CTEs so each 64-bit multiply appears once (inline nesting would blow
  the expression tree up exponentially).

Bit-parity of the three primitives with functions/hashing.py is pinned in
isolation in tests/test_oracles.py, and end-to-end by the er_*_exact
oracle checks in tests/test_queries.py (any drift fails the value-hash).
"""

from __future__ import annotations

_MOD = "18446744073709551616"
MASK63 = "9223372036854775807"

# splitmix64 / node-mix constants (functions/hashing.py, stages/pairwise.py)
SM_ADD = "11400714819323198485"          # 0x9E3779B97F4A7C15
SM_MUL1 = "13787848793156543929::UBIGINT"  # 0xBF58476D1CE4E5B9
SM_MUL2 = "10723151780598845931::UBIGINT"  # 0x94D049BB133111EB
MIX_C1 = "11400714819323198485::UBIGINT"   # span_idx multiplier
MIX_C2 = "14029467366897019727::UBIGINT"   # offset multiplier


def mul64(a: str, b: str) -> str:
    """SQL for (a * b) mod 2^64 over UBIGINT operands."""
    return (
        f"CAST(((CAST(({a}) % 4294967296 AS HUGEINT) * CAST(({b}) AS HUGEINT)) % {_MOD}"
        f" + ((CAST(({a}) // 4294967296 AS HUGEINT) * CAST(({b}) AS HUGEINT)) % 4294967296)"
        f" * 4294967296) % {_MOD} AS UBIGINT)"
    )


def fnv1a_sql(s_expr: str) -> str:
    """SQL for fnv1a_64(s.encode()) — byte-exact for ASCII strings."""
    codes = (
        f"list_transform(range(1, length({s_expr})+1),"
        f" j -> CAST(ord(substr({s_expr}, j, 1)) AS UBIGINT))"
    )
    lam = mul64("xor(acc, b)", "1099511628211::UBIGINT")
    return f"list_reduce(list_prepend(14695981039346656037::UBIGINT, {codes}), (acc, b) -> {lam})"


def splitmix_stages(prefix: str, src: str, x: str, out: str, keep: str) -> str:
    """Chained CTEs computing ``out`` = splitmix64(``x``) from CTE ``src``,
    carrying the ``keep`` column list through. Emits text to splice after a
    previous CTE (starts with a comma)."""
    return f"""
{prefix}a AS (SELECT {keep}, xor(z0, z0 >> 30) AS t1 FROM
    (SELECT {keep}, CAST((CAST({x} AS HUGEINT) + {SM_ADD}) % {_MOD} AS UBIGINT) AS z0 FROM {src})),
{prefix}b AS (SELECT {keep}, {mul64('t1', SM_MUL1)} AS t1m FROM {prefix}a),
{prefix}c AS (SELECT {keep}, {mul64('xor(t1m, t1m >> 27)', SM_MUL2)} AS t2m FROM {prefix}b),
{prefix}d AS (SELECT {keep}, xor(t2m, t2m >> 31) AS {out} FROM {prefix}c)"""


# The deterministic-KB alias → min-entity_id map (testdata.derive_entities:
# with score_weights=(1,0) every exact candidate ties at 1.0, so the stable
# (score desc, entity_id asc) tie-break links each surface to its lowest
# entity id — which makes the whole link decision SQL-expressible).
KB_VALUES = (
    "VALUES ('spark','T00000'),('customer','T00002'),('vector','T00004'),"
    "('stream','T00005'),('window','T00008'),('query','T00009'),"
    "('merge','T00011'),('hash','T00012')"
)

# The FULL alias → entity map (testdata.derive_entities: 1-3 entities per
# alias word) — the exact-channel candidate SET per mention, used by the
# scored-pairs oracle where every candidate (not just the argmax) appears.
KB_FULL_VALUES = (
    "VALUES ('spark','T00000'),('spark','T00001'),"
    "('customer','T00002'),('customer','T00003'),"
    "('vector','T00004'),"
    "('stream','T00005'),('stream','T00006'),('stream','T00007'),"
    "('window','T00008'),"
    "('query','T00009'),('query','T00010'),"
    "('merge','T00011'),"
    "('hash','T00012'),('hash','T00013')"
)


def er_exact_sql(what: str) -> str:
    """Full oracle SQL for er_links_exact / er_clusters_exact.

    Reproduces, in DuckDB: the interleave derivation (testdata.interleave_batch
    — 12-token chunks, fnv1a-gated media-span injection and its +1 offset and
    span_idx shifts), mention extraction (alias-token matches with char
    offsets), the exact-channel link decision, the 63-bit mention node hash
    (stages/pairwise.py:106 mention_node_hashes), and for clusters the
    degree-1 component label = min(anchor hash, min mention node)."""
    assert what in ("links", "clusters", "pairs", "mentions", "annotated")
    if what == "annotated":
        # per-doc mention/link counts over ALL docs (zero-mention docs
        # included — the broadcast attach emits 0 on searchsorted miss);
        # under the exact config every mention links, so the two counts
        # coincide
        words = ("['spark','customer','vector','stream','window',"
                 "'query','merge','hash']")
        n = (f"CAST(len(list_filter(string_split(text, ' '),"
             f" t -> list_contains({words}, t))) AS BIGINT)")
        return f"""
    SELECT printf('doc-%08d', doc_id) AS doc_id,
           {n} AS n_mentions,
           {n} AS n_linked
    FROM documents"""
    if what == "pairs":
        # the explode path: every exact candidate, ranked by the stable
        # (score desc, entity_id asc) tie-break — with all scores tied at
        # 1.0 the rank IS the per-mention entity_id order
        return f"""
WITH kb AS (SELECT * FROM ({KB_VALUES}) AS v(alias, entity_id)),
kbf AS (SELECT * FROM ({KB_FULL_VALUES}) AS v(alias, entity_id)),
docs AS (
  SELECT printf('doc-%08d', doc_id) AS doc_id,
         {fnv1a_sql("CAST(doc_id AS VARCHAR)")} AS h,
         string_split(text, ' ') AS l
  FROM documents
),
toks AS (
  SELECT doc_id, h, unnest(l) AS tok, unnest(range(0, len(l))) AS i FROM docs
),
men0 AS (
  SELECT doc_id, h, tok, i, CAST(i // 12 AS UBIGINT) AS c,
         CAST(coalesce(sum(length(tok) + 1) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS UBIGINT) AS joff
  FROM toks
),
men AS (
  SELECT doc_id, h, tok, c, joff,
         CAST(len(list_filter(range(3, CAST(c AS BIGINT) + 1, 3),
                  m -> (h >> (m % 32)) & 1 = 1)) AS UBIGINT) AS shift
  FROM men0 WHERE tok IN (SELECT alias FROM kb)
)
SELECT men.doc_id,
       CAST(c + shift AS INT) AS span_idx,
       CAST(joff + shift AS INT) AS "offset",
       kbf.entity_id,
       CAST(1.0 AS REAL) AS score,
       CAST(row_number() OVER (
            PARTITION BY men.doc_id, c + shift, joff + shift
            ORDER BY kbf.entity_id) - 1 AS INT) AS rank,
       'exact' AS source
FROM men JOIN kbf ON men.tok = kbf.alias"""
    if what == "mentions":
        # the mentions logical table incl. the context-window builder
        # (M5 analogue): context_left/right are char windows WITHIN the
        # span's chunk text (stages/mentions.py MentionExtractor.__call__),
        # reconstructed here from the 12-token chunking
        cw = 120  # stages/mentions.CONTEXT_CHARS
        return f"""
WITH kb AS (SELECT * FROM ({KB_VALUES}) AS v(alias, entity_id)),
docs AS (
  SELECT printf('doc-%08d', doc_id) AS doc_id,
         {fnv1a_sql("CAST(doc_id AS VARCHAR)")} AS h,
         string_split(text, ' ') AS l
  FROM documents
),
toks AS (
  SELECT doc_id, h, unnest(l) AS tok, unnest(range(0, len(l))) AS i FROM docs
),
men0 AS (
  SELECT doc_id, h, tok, i, CAST(i // 12 AS UBIGINT) AS c,
         CAST(coalesce(sum(length(tok) + 1) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS UBIGINT) AS joff
  FROM toks
),
chunks AS (
  SELECT doc_id, c, string_agg(tok, ' ' ORDER BY i) AS ctext,
         min(joff) AS cbase
  FROM men0 GROUP BY doc_id, c
),
men AS (
  SELECT m.doc_id, m.h, m.tok, m.c, m.joff,
         CAST(m.joff - ch.cbase AS INT) AS s,
         ch.ctext,
         CAST(len(list_filter(range(3, CAST(m.c AS BIGINT) + 1, 3),
                  mm -> (m.h >> (mm % 32)) & 1 = 1)) AS UBIGINT) AS shift
  FROM men0 m JOIN chunks ch ON m.doc_id = ch.doc_id AND m.c = ch.c
  WHERE m.tok IN (SELECT alias FROM kb)
)
SELECT doc_id,
       CAST(c + shift AS INT) AS span_idx,
       tok AS mention,
       tok AS norm_mention,
       substr(ctext, greatest(1, s - {cw} + 1), least(s, {cw})) AS context_left,
       substr(ctext, s + length(tok) + 1, {cw}) AS context_right,
       CAST(joff + shift AS INT) AS "offset"
FROM men"""
    base = 'doc_id, entity_id, span_idx, "offset"'
    sql = f"""
WITH kb AS (SELECT * FROM ({KB_VALUES}) AS v(alias, entity_id)),
docs AS (
  SELECT printf('doc-%08d', doc_id) AS doc_id,
         {fnv1a_sql("CAST(doc_id AS VARCHAR)")} AS h,
         string_split(text, ' ') AS l
  FROM documents
),
toks AS (
  SELECT doc_id, h, unnest(l) AS tok, unnest(range(0, len(l))) AS i FROM docs
),
men0 AS (
  SELECT doc_id, h, tok, i, CAST(i // 12 AS UBIGINT) AS c,
         CAST(coalesce(sum(length(tok) + 1) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS UBIGINT) AS joff
  FROM toks
),
men AS (
  SELECT doc_id, h, tok, c, joff,
         CAST(len(list_filter(range(3, CAST(c AS BIGINT) + 1, 3),
                  m -> (h >> (m % 32)) & 1 = 1)) AS UBIGINT) AS shift
  FROM men0 WHERE tok IN (SELECT alias FROM kb)
),
men2 AS (
  SELECT doc_id, tok,
         CAST(c + shift AS INT) AS span_idx,
         CAST(joff + shift AS INT) AS "offset",
         {fnv1a_sql('doc_id')} & {MASK63} AS dh,
         CAST((CAST({mul64('c + shift', MIX_C1)} AS HUGEINT)
               + CAST({mul64('joff + shift', MIX_C2)} AS HUGEINT) + 1) % {_MOD} AS UBIGINT) AS x1
  FROM men
),
lk AS (SELECT men2.*, kb.entity_id FROM men2 JOIN kb ON men2.tok = kb.alias),
{splitmix_stages("mx", "lk", "x1", "mix", base + ", dh")},
nx0 AS (SELECT {base}, xor(dh, mix) AS x2 FROM mxd),
{splitmix_stages("nx", "nx0", "x2", "nmix", base)},
links AS (SELECT {base}, CAST(nmix & {MASK63} AS BIGINT) AS node FROM nxd)
"""
    if what == "links":
        return sql + """
SELECT doc_id, span_idx, "offset", entity_id, CAST(1.0 AS REAL) AS score, node
FROM links"""
    return sql + f"""
, anchors AS (
  SELECT entity_id,
         CAST({fnv1a_sql("'e|' || entity_id")} & {MASK63} AS BIGINT) AS anchor
  FROM (SELECT DISTINCT entity_id FROM kb)
),
labels AS (
  SELECT l.entity_id, least(min(l.node), any_value(a.anchor)) AS label
  FROM links l JOIN anchors a USING (entity_id) GROUP BY l.entity_id
)
SELECT l.doc_id, l.span_idx, l."offset", CAST(lb.label AS VARCHAR) AS cluster_id
FROM links l JOIN labels lb USING (entity_id)"""
