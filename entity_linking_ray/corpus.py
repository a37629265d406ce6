"""Deterministic synthetic corpus generator (seed-42, no external data).

Produces the four fixture tables from FIXTURES.md over the interleaved
document shape mandated by BASELINE.json ``input_hint``:

- ``documents``     (doc_id, spans: list<struct<kind,text,media_ref,offset>>)
- ``entities``      (entity_id, subject, aliases, types, infobox)
- ``mentions_gold`` (doc_id, span_idx, mention, entity_id, offset)

Edge cases covered (FIXTURES.md §7): a hot alias shared by ≥50 entities
with ≥200 mentions; NIL mentions; a stopword-like alias; punctuation /
case / accent near-duplicate surfaces; CJK mentions with char offsets;
empty and over-budget infoboxes; repeated mentions in one doc; duplicate
aliases; media-only and 0-span and 100+-span docs.

The reference analogue of this corpus is CCKS train.json + kb_data
(``entity_sort/data/train.json:1``, ``el_process.py:28-44``); the
structure (alias collisions driving hard negatives) mirrors
``el_preprocess.py:90-122``.
"""

from __future__ import annotations

import random

import pyarrow as pa

from . import schemas

SEED = 42
HOT_ALIAS = "alpha prime"
STOPWORD_ALIAS = "the"
FILLERS = [
    "zun", "murk", "velp", "quon", "jask", "brimp", "floz", "grent",
    "hode", "ilp", "krun", "lomp", "nuft", "oggle", "prew", "squib",
    "trax", "umber", "vose", "wintle",
]
_SYL = [
    "ka", "ri", "to", "ve", "lun", "mar", "sol", "bel", "dor", "fin",
    "gra", "hul", "jen", "kor", "lam", "nim", "pol", "qua", "ros", "tan",
]
_CJK_ALIAS_POOL = "南京北站高铁汽车大学银行公园博物馆医院机场剧场"
_CJK_PROFILE_POOL = "星云山河日月光风雷雨雪木火土金水"
_CJK_FILLERS = list("东中外内上下左右前后间又")
_PRED_POOL = ["类型", "摘要", "标签", "位置", "属于"]


def _alias_word(i: int) -> str:
    return _SYL[i % 20] + _SYL[(i // 20 + i) % 20]


def _profile_words(eid: int) -> list[str]:
    return [f"{_SYL[(eid * 7 + k) % 20]}{_SYL[(eid * 3 + k * 5) % 20]}{eid}" for k in range(6)]


def _cjk_profile_words(slot: int) -> list[str]:
    pool = _CJK_PROFILE_POOL
    out = []
    for k in range(6):
        j = slot * 6 + k
        out.append(pool[j % len(pool)] + pool[(j * 7 + 3) % len(pool)] + str(slot))
    return out


def profile_text(subject: str, profile: list[str]) -> str:
    """The text embedded for an entity (subject + profile bag). Used both by
    the generator and by the pipeline's entity-embedding stage so the
    signal is consistent."""
    return subject + " " + " ".join(profile)


def make_entities(n_entities: int = 120, hot_entities: int = 50, n_cjk: int = 10,
                  seed: int = SEED) -> tuple[pa.Table, dict]:
    """Returns (entities table, meta dict with per-entity profiles/aliases)."""
    rng = random.Random(seed)
    rows = []
    meta: dict[str, dict] = {}
    eid = 0

    def add(subject: str, aliases: list[str], profile: list[str],
            types: list[str] | None = None, infobox: list[dict] | None = None):
        nonlocal eid
        entity_id = f"E{eid:05d}"
        if infobox is None:
            infobox = [
                {"predicate": "profile", "object": " ".join(profile)},
                {"predicate": rng.choice(_PRED_POOL), "object": rng.choice(profile)},
            ]
        rows.append(
            {
                "entity_id": entity_id,
                "subject": subject,
                "aliases": aliases,
                "types": types or ["Thing"],
                "infobox": infobox,
            }
        )
        meta[entity_id] = {"subject": subject, "aliases": aliases, "profile": profile}
        eid += 1

    # hot block: many entities sharing one alias (salting-path fixture)
    for i in range(hot_entities):
        add(f"Alpha Prime {i}", [HOT_ALIAS, f"alpha prime {i}"], _profile_words(i))

    # CJK entities (char-offset fixture)
    for i in range(n_cjk):
        a = _CJK_ALIAS_POOL[(i * 3) % len(_CJK_ALIAS_POOL)]
        b = _CJK_ALIAS_POOL[(i * 3 + 1) % len(_CJK_ALIAS_POOL)]
        c = _CJK_ALIAS_POOL[(i * 3 + 2) % len(_CJK_ALIAS_POOL)]
        alias = a + b + c + str(i)
        add(alias, [alias], _cjk_profile_words(i), types=["地点"])

    # curated near-duplicate-surface entities
    add("Café de Flore", ["Café de Flore", "cafe de flore"], _profile_words(900))
    add("LG G5", ["LG G5", "lg g5", "lg-g5"], _profile_words(901))
    # stopword-like alias (must be filtered at extraction, el_main.py:534-537)
    add("The Band", [STOPWORD_ALIAS, "the band"], _profile_words(902))
    # duplicate aliases on one entity (exact dedup D1)
    add("Dup Alias Co", ["dupalias corp", "dupalias corp", "dup alias co"], _profile_words(903))
    # empty infobox (description fallback M7). Not planted as a mention
    # target: a description-less entity is indistinguishable from NIL under
    # context-based scoring (the reference's trained scorer has the same
    # degeneracy — its fallback description carries no signal either).
    add("Empty Box", ["empty box"], _profile_words(904), infobox=[])
    meta["E" + f"{eid - 1:05d}"]["no_plant"] = True
    # over-budget infobox (truncation M7)
    big_profile = _profile_words(905)
    add("Big Box", ["big box"], big_profile,
        infobox=[{"predicate": "profile", "object": " ".join(big_profile)}]
        + [{"predicate": "p" + str(k), "object": "x" * 60} for k in range(12)])

    # shared-alias small groups (hard negatives, el_preprocess.py:90-122)
    n_groups = 10
    g = 0
    while eid < n_entities - 10 and g < n_groups:
        alias = _alias_word(40 + g * 2) + " " + _alias_word(41 + g * 2)
        for j in range(2 + g % 2):
            add(f"{alias} v{j}", [alias, f"{alias} v{j}"], _profile_words(eid))
        g += 1

    # unique entities to fill up
    u = 0
    while eid < n_entities:
        alias = _alias_word(100 + u * 3) + " " + _alias_word(101 + u * 3)
        add(alias.title(), [alias], _profile_words(eid))
        u += 1

    table = pa.Table.from_pylist(rows, schema=schemas.ENTITIES)
    return table, meta


def make_documents(meta: dict, n_docs: int = 400, hot_mentions: int = 220,
                   nil_rate: float = 0.08, seed: int = SEED) -> tuple[pa.Table, pa.Table]:
    """Returns (documents, mentions_gold). Context words are drawn from the
    gold entity's profile so a cosine scorer can disambiguate shared
    aliases; NIL mentions get filler-only context."""
    rng = random.Random(seed + 1)
    ids = sorted(meta)
    hot_ids = [e for e in ids if HOT_ALIAS in meta[e]["aliases"]]
    cjk_ids = [e for e in ids if any("一" <= ch <= "鿿" for ch in meta[e]["subject"])]
    stop_ids = [e for e in ids if STOPWORD_ALIAS in meta[e]["aliases"]]
    normal_ids = [e for e in ids if e not in set(cjk_ids) and not meta[e].get("no_plant")]

    # pre-plan mention gold assignments so the hot alias gets its quota
    plan: list[tuple[str, bool]] = []  # (entity_id, is_nil)
    for k in range(hot_mentions):
        plan.append((hot_ids[k % len(hot_ids)], False))
    n_rest = max(n_docs * 4 - hot_mentions, 0)
    for _ in range(n_rest):
        is_nil = rng.random() < nil_rate
        pool = cjk_ids if rng.random() < 0.12 and cjk_ids else normal_ids
        plan.append((rng.choice(pool), is_nil))
    rng.shuffle(plan)

    doc_rows, gold_rows = [], []
    cursor = 0

    def latin_sentence(entity_id: str, is_nil: bool) -> tuple[str, str, int]:
        info = meta[entity_id]
        alias = rng.choice(info["aliases"])
        if alias == STOPWORD_ALIAS:
            alias = info["aliases"][-1]
        ctx = ([rng.choice(FILLERS) for _ in range(10)] if is_nil
               else rng.sample(info["profile"], 5) + info["profile"][:3]
               + [rng.choice(FILLERS) for _ in range(2)])
        rng.shuffle(ctx)
        cut = rng.randint(2, len(ctx) - 2)
        left = " ".join(ctx[:cut])
        right = " ".join(ctx[cut:])
        text = f"{left} {alias} {right}"
        return text, alias, len(left) + 1

    def cjk_sentence(entity_id: str, is_nil: bool) -> tuple[str, str, int]:
        info = meta[entity_id]
        alias = info["aliases"][0]
        ctx = ([rng.choice(_CJK_FILLERS) for _ in range(6)] if is_nil
               else list(info["profile"]) + [rng.choice(info["profile"]) for _ in range(2)])
        rng.shuffle(ctx)
        cut = rng.randint(1, len(ctx) - 1)
        left = "".join(ctx[:cut])
        right = "".join(ctx[cut:])
        return f"{left}{alias}{right}", alias, len(left)

    for d in range(n_docs):
        doc_id = f"doc-{d:06d}"
        spans, gold_local = [], []
        offset = 0
        # structural edge cases
        if d == 0:
            doc_rows.append({"doc_id": doc_id, "spans": []})  # 0-span doc
            continue
        if d == 1:  # media-only doc
            for k in range(3):
                spans.append({"kind": rng.choice(["image", "audio"]), "text": "",
                              "media_ref": f"media://{doc_id}/{k}", "offset": offset})
                offset += 1
            doc_rows.append({"doc_id": doc_id, "spans": spans})
            continue

        n_mentions = 120 if d == 2 else rng.randint(2, 6)  # d==2 → 100+ spans
        while plan and n_mentions > 0 and cursor < len(plan):
            entity_id, is_nil = plan[cursor]
            cursor += 1
            n_mentions -= 1
            is_cjk = entity_id in cjk_ids
            text, alias, rel = (cjk_sentence if is_cjk else latin_sentence)(entity_id, is_nil)
            span_idx = len(spans)
            spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
            gold_local.append(
                {"doc_id": doc_id, "span_idx": span_idx, "mention": alias,
                 "entity_id": "NIL" if is_nil else entity_id, "offset": offset + rel})
            offset += len(text) + 1
            if rng.random() < 0.25:  # interleave a media span
                spans.append({"kind": rng.choice(["image", "audio", "table"]), "text": "",
                              "media_ref": f"media://{doc_id}/{span_idx}", "offset": offset})
                offset += 1
        # a filler-only text span sometimes (mention-free text)
        if rng.random() < 0.3:
            t = " ".join(rng.choice(FILLERS) for _ in range(8))
            spans.append({"kind": "text", "text": t, "media_ref": "", "offset": offset})
            offset += len(t) + 1
        doc_rows.append({"doc_id": doc_id, "spans": spans})
        gold_rows.extend(gold_local)

    docs = pa.Table.from_pylist(doc_rows, schema=schemas.DOCUMENTS)
    gold = pa.Table.from_pylist(gold_rows, schema=schemas.MENTIONS_GOLD)
    return docs, gold


def make_corpus(n_entities: int = 120, n_docs: int = 400, hot_entities: int = 50,
                hot_mentions: int = 220, seed: int = SEED) -> dict[str, pa.Table]:
    entities, meta = make_entities(n_entities=n_entities, hot_entities=hot_entities, seed=seed)
    docs, gold = make_documents(meta, n_docs=n_docs, hot_mentions=hot_mentions, seed=seed)
    return {"documents": docs, "entities": entities, "mentions_gold": gold}


def write_corpus(out_dir: str, **kwargs) -> dict[str, str]:
    """Writes parquet files; returns name→path. (Lance layout when the
    ``lance`` package is available — not shipped in this sandbox, so the
    reader in sources/documents.py falls back to parquet.)"""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    tables = make_corpus(**kwargs)
    paths = {}
    for name, tbl in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths
