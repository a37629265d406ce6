"""S15 benchmark readers: delimited mention/candidate CSV + CoNLL docs."""

import ray

from entity_linking_ray.sources.benchmarks import (
    attach_conll_text, read_benchmark_mentions, read_conll,
)

CSV = (
    "1	testa	Japan	began the	defence of	CANDIDATES"
    "	38698,0.957,Japan	8664,0.02,Japan national team	GT:	1,38698,0.957,Japan\n"
    "1	testa	London	played in	yesterday	CANDIDATES"
    "	EMPTYCAND	GT:	-1,17867,London \"City\"\n"
    "\n"
    "2	testa	Asian Cup	the	holders	CANDIDATES	1013,1.0,Asian Cup"
    "	GT:	1,1013,1.0,Asian Cup\n"
)

CONLL = """-DOCSTART- (1 testa)
Japan\tB\tJapan\tJapan\tJapan_wiki\t38698\t/m/03_3d
began
the
defence

of
London\tB\tLondon\tLondon\tLondon_wiki\t17867\t/m/04jpl
-DOCSTART- (2 testa)
Asian\tB\tAsian Cup\tAsian_Cup\tAC_wiki\t1013\t/m/0235n
Cup\tI\tAsian Cup\tAsian_Cup\tAC_wiki\t1013\t/m/0235n
holders
"""


def test_read_benchmark_mentions(tmp_path, ray_session):
    p = tmp_path / "aida_testA.csv"
    p.write_text(CSV, encoding="utf8")
    rows = sorted(read_benchmark_mentions(str(p)).take_all(),
                  key=lambda r: r["mention"])
    assert [r["mention"] for r in rows] == ["Asian Cup", "Japan", "London"]
    japan = rows[1]
    assert japan["doc_name"] == "1 testa"
    assert japan["context_left"] == "began the"
    assert japan["gold_entity"] == "Japan"
    # comma-containing candidate names reassemble; spaces → underscores
    assert japan["candidates"] == [
        {"entity": "Japan", "prior": 0.957},
        {"entity": "Japan_national_team", "prior": 0.02},
    ]
    london = rows[2]
    assert london["candidates"] == []  # EMPTYCAND
    # -1 gold sentinel: skip 2 fields; quote → %22, space → _
    assert london["gold_entity"] == 'London_%22City%22'


def test_read_conll_and_attach(tmp_path, ray_session):
    p = tmp_path / "docs.conll"
    p.write_text(CONLL, encoding="utf8")
    docs = {r["doc_name"]: r for r in read_conll(str(p)).take_all()}
    assert set(docs) == {"1", "2"}
    d1 = docs["1"]
    assert d1["sentences"] == [["Japan", "began", "the", "defence"], ["of", "London"]]
    assert d1["mentions"] == [
        {"sent_id": 0, "start": 0, "end": 1, "wikilink": "Japan_wiki"},
        {"sent_id": 1, "start": 1, "end": 2, "wikilink": "London_wiki"},
    ]
    # I-continuation extends the open B span
    assert docs["2"]["mentions"] == [
        {"sent_id": 0, "start": 0, "end": 2, "wikilink": "AC_wiki"},
    ]

    csv_p = tmp_path / "m.csv"
    csv_p.write_text(CSV, encoding="utf8")
    joined = attach_conll_text(read_benchmark_mentions(str(csv_p)),
                               read_conll(str(p))).take_all()
    by_mention = {r["mention"]: r for r in joined}
    assert by_mention["Japan"]["doc_tokens"] == [
        "Japan", "began", "the", "defence", "of", "London"]
    assert by_mention["Asian Cup"]["doc_tokens"] == ["Asian", "Cup", "holders"]
