"""run_benchmark analogue: gold positions + recall@gen over S15 fixtures."""

import ray
import ray.data

from entity_linking_ray.pipelines.benchmark import add_gold_pos, recall_at_gen
from entity_linking_ray.sources.benchmarks import read_benchmark_mentions

CSV_A = (
    "1	a	Japan	l	r	C	38698,0.9,Japan	8664,0.05,Nihon	GT:	1,38698,0.9,Japan\n"
    "1	a	Paris	l	r	C	100,0.8,Paris Texas	GT:	1,101,0.7,Paris\n"  # gold absent
    "2	a	Rome	l	r	C	EMPTYCAND	GT:	1,7,1.0,Rome\n"
)
CSV_B = "3	b	Kyoto	l	r	C	9,0.5,Osaka	10,0.4,Kyoto	GT:	1,10,0.4,Kyoto\n"


def test_gold_pos_and_recall(tmp_path, ray_session):
    pa_ = tmp_path / "a.csv"
    pa_.write_text(CSV_A, encoding="utf8")
    pb = tmp_path / "b.csv"
    pb.write_text(CSV_B, encoding="utf8")
    a = read_benchmark_mentions(str(pa_))
    b = read_benchmark_mentions(str(pb))

    pos = {r["mention"]: r["gold_pos"]
           for r in add_gold_pos(a, "A").take_all()}
    assert pos == {"Japan": 1, "Paris": -1, "Rome": -1}

    rec = recall_at_gen({"A": a, "B": b})
    assert abs(rec["A"] - 1 / 3) < 1e-9   # only Japan's gold is present
    assert rec["B"] == 1.0                # Kyoto gold at pos 2
    assert abs(rec["overall"] - 2 / 4) < 1e-9

    # max_rank=1 drops Kyoto (gold at position 2)
    rec1 = recall_at_gen({"A": a, "B": b}, max_rank=1)
    assert rec1["B"] == 0.0 and abs(rec1["overall"] - 1 / 4) < 1e-9


def test_benchmark_report_golden(ray_session):
    """The full run_benchmark.py:57-94 analogue over the checked-in
    multi-dataset fixture: per-dataset recall@gen + support table with
    pinned golden values. The fixture exercises every dataset.py parser
    path — comma-containing entity names, EMPTYCAND, the -1 gold
    sentinel, and quote/space normalization."""
    import os

    from entity_linking_ray.pipelines.benchmark import benchmark_report

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "benchmark")
    datasets = {
        "AIDA-YAGO2 testa": os.path.join(fix, "aida_testa.csv"),
        "AIDA-YAGO2 testb": os.path.join(fix, "aida_testb.csv"),
        "ACE 2004": os.path.join(fix, "ace2004.csv"),
        "msnbc": os.path.join(fix, "msnbc.csv"),
    }

    df = benchmark_report(datasets)
    got = {r["dataset"]: (r["recall_at_gen"], r["support"])
           for _, r in df.iterrows()}
    # golden table (the reference's prettytable rows)
    assert got == {
        "AIDA-YAGO2 testa": (0.8, 5),     # Paris gold absent
        "AIDA-YAGO2 testb": (0.5, 4),     # EMPTYCAND + -1-sentinel miss
        "ACE 2004": (1.0, 3),
        "msnbc": (0.25, 4),               # only the quoted name hits
        "overall": (0.625, 16),
    }
    assert list(df["dataset"]) == list(datasets) + ["overall"]

    # recall@1: Rome (pos 2) and Madrid (pos 2) drop out
    df1 = benchmark_report(datasets, max_rank=1)
    got1 = {r["dataset"]: r["recall_at_gen"] for _, r in df1.iterrows()}
    assert got1 == {"AIDA-YAGO2 testa": 0.6, "AIDA-YAGO2 testb": 0.25,
                    "ACE 2004": 1.0, "msnbc": 0.25, "overall": 0.5}


def test_benchmark_report_zero_mention_dataset(tmp_path, ray_session):
    """A dataset whose CSV parses to zero mentions must report recall 0.0
    / support 0 instead of raising KeyError."""
    import pandas as pd

    from entity_linking_ray.pipelines.benchmark import benchmark_report

    good = tmp_path / "good.csv"
    good.write_text(CSV_B, encoding="utf8")
    empty = tmp_path / "empty.csv"
    empty.write_text("\n", encoding="utf8")  # parses to zero mentions
    rep = benchmark_report({"good": str(good), "none": str(empty)})
    row = rep.set_index("dataset").loc["none"]
    assert row["support"] == 0 and row["recall_at_gen"] == 0.0
    assert rep.set_index("dataset").loc["overall"]["support"] == 1


def test_adjusted_rand_index():
    import pandas as pd

    from entity_linking_ray.pipelines.eval import adjusted_rand_index

    gold = pd.DataFrame({
        "doc_id": ["d"] * 6, "span_idx": range(6), "offset": range(6),
        "mention": list("abcdef"),
        "entity_id": ["E1", "E1", "E1", "E2", "E2", "NIL"],
    })
    perfect = pd.DataFrame({
        "doc_id": ["d"] * 6, "span_idx": range(6), "offset": range(6),
        "cluster_id": ["c1", "c1", "c1", "c2", "c2", "c3"],
    })
    assert adjusted_rand_index(perfect, gold)["ari"] == 1.0
    # one mention moved across clusters: hand-computed ARI
    # contingency: g1={c1:2,c2:1}, g2={c2:2}, nil={c3:1}
    moved = perfect.copy()
    moved.loc[2, "cluster_id"] = "c2"
    r = adjusted_rand_index(moved, gold)
    sum_ij = 1 + 0 + 1 + 0  # C(2,2 rows): c(2,2)=1 for (g1,c1); (g2,c2)=1
    sum_g, sum_p = (3 + 1 + 0), (1 + 3 + 0)  # C(3,2)+C(2,2)... computed below
    import math
    sum_g = math.comb(3, 2) + math.comb(2, 2) + math.comb(1, 2)
    sum_p = math.comb(2, 2) + math.comb(3, 2) + math.comb(1, 2)
    n_pairs = math.comb(6, 2)
    exp = sum_g * sum_p / n_pairs
    want = (sum_ij - exp) / ((sum_g + sum_p) / 2 - exp)
    assert abs(r["ari"] - want) < 1e-12
    # everything merged into one cluster ≠ gold: ARI well below 1
    allone = perfect.copy(); allone["cluster_id"] = "x"
    assert adjusted_rand_index(allone, gold)["ari"] < 0.5
