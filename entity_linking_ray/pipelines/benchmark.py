"""Benchmark-dataset evaluation glue: S15 readers → candidate-retrieval
recall, the ``run_benchmark.py`` analogue.

Reference semantics (``candidate_retrieval/evaluator.py:16-91`` +
``run_benchmark.py:57-94``): per mention, the gold entity's 1-based
position among its (pregenerated or engine-generated) candidates;
``recall@gen`` = share of mentions whose gold appears at all (optionally
within ``max_rank``); reported per dataset and overall.

Ray-Data-first: gold positions are a vectorized per-batch map; recall is
one tiny groupby over per-batch partial (dataset, hits, total) counts —
events-scale data never collects on the driver."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def add_gold_pos(mentions: ray.data.Dataset,
                 dataset_name: str = "dataset") -> ray.data.Dataset:
    """Benchmark-mention rows (sources/benchmarks.py MENTIONS_SCHEMA) →
    + ``gold_pos`` (1-based position of gold among candidates, -1 when
    absent — evaluator.py:28-56 semantics) + ``dataset`` tag."""

    def pos(batch: pa.Table) -> pa.Table:
        golds = batch["gold_entity"].to_pylist()
        cands = batch["candidates"].to_pylist()
        gp = []
        for g, cl in zip(golds, cands):
            p = -1
            for idx, c in enumerate(cl or []):
                if c["entity"] == g:
                    p = idx + 1
                    break
            gp.append(p)
        return batch.append_column(
            "gold_pos", pa.array(gp, pa.int32())).append_column(
            "dataset", pa.array([dataset_name] * batch.num_rows, pa.string()))

    return mentions.map_batches(pos, batch_format="pyarrow")


def _recall_counts(mentions_by_dataset: dict[str, ray.data.Dataset],
                   max_rank: int | None = None) -> dict[str, tuple[int, int]]:
    """{dataset: (hits, total)} via one small distributed groupby over
    per-batch partial counts (the shared engine under recall_at_gen and
    benchmark_report)."""
    tagged = [add_gold_pos(ds, name) for name, ds in mentions_by_dataset.items()]
    allm = tagged[0]
    for t in tagged[1:]:
        allm = allm.union(t)

    def partial(batch: pa.Table) -> pa.Table:
        hit = pc.and_(
            pc.greater(batch["gold_pos"], 0),
            pc.less_equal(batch["gold_pos"], max_rank)
            if max_rank is not None else pa.array([True] * batch.num_rows))
        t = pa.table({
            "dataset": batch["dataset"],
            "hit": pc.cast(hit, pa.int64()),
            "one": pa.array([1] * batch.num_rows, pa.int64()),
        })
        return (t.group_by("dataset").aggregate([("hit", "sum"), ("one", "sum")])
                .rename_columns(["dataset", "hits", "total"]))

    from ray.data.aggregate import Sum

    agg = (allm.map_batches(partial, batch_format="pyarrow")
           .groupby("dataset")
           .aggregate(Sum("hits", alias_name="hits"),
                      Sum("total", alias_name="total")))
    return {row["dataset"]: (row["hits"], row["total"])
            for row in agg.take_all()}


def recall_at_gen(mentions_by_dataset: dict[str, ray.data.Dataset],
                  max_rank: int | None = None) -> dict[str, float]:
    """{dataset: recall@gen} + "overall" (evaluator.py:62-84). Each input
    dataset is tagged and unioned; one small groupby computes the table."""
    counts = _recall_counts(mentions_by_dataset, max_rank)
    # a dataset that parses to zero mentions produces no groupby row —
    # report recall 0.0 / support 0 instead of dropping (or KeyError-ing
    # on) the name
    out = {name: (counts[name][0] / counts[name][1]
                  if counts.get(name, (0, 0))[1] else 0.0)
           for name in mentions_by_dataset}
    hits = sum(h for h, _ in counts.values())
    total = sum(t for _, t in counts.values())
    out["overall"] = hits / total if total else 0.0
    return out


def benchmark_report(dataset_paths: dict[str, "list[str] | str"],
                     max_rank: int | None = None):
    """The full ``run_benchmark.py:57-94`` analogue: read every S15
    benchmark CSV, compute recall@gen + support per dataset, and return
    the summary table (the reference's prettytable) as a pandas DataFrame
    with columns ``(dataset, recall_at_gen, support)`` in input order plus
    a final ``overall`` row. Each dataset streams through the one shared
    recall groupby — no per-mention driver collection."""
    import pandas as pd

    from ..sources.benchmarks import read_benchmark_mentions

    dsets = {name: read_benchmark_mentions(p)
             for name, p in dataset_paths.items()}
    counts = _recall_counts(dsets, max_rank)
    # empty datasets (zero parsed mentions) get recall 0.0 / support 0
    rows = [{"dataset": name,
             "recall_at_gen": (round(h / t, 4) if t else 0.0),
             "support": t}
            for name in dataset_paths
            for h, t in [counts.get(name, (0, 0))]]
    hits = sum(h for h, _ in counts.values())
    total = sum(t for _, t in counts.values())
    rows.append({"dataset": "overall",
                 "recall_at_gen": round(hits / total, 4) if total else 0.0,
                 "support": total})
    return pd.DataFrame(rows, columns=["dataset", "recall_at_gen", "support"])
