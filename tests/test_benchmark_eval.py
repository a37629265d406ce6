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
