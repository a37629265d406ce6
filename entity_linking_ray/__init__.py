"""Ray-Data-native entity-resolution engine.

A from-scratch blocking + pairwise-scoring + transitive-clustering
record-linkage pipeline with the query/data-processing capabilities of the
reference repo surveyed in SURVEY.md (EduKgs/entity_linking), re-expressed as
idiomatic Ray Data: streaming ``ray.data.Dataset`` pipelines, zero-copy Arrow
``map_batches``, actor pools for stateful stages, explicit shuffles for the
wide steps.

Nothing here calls ``ray.init()`` / ``ray.shutdown()`` — sessions are owned
by the caller (driver harness, ``bench.py``, or the pytest fixture).
"""

__version__ = "0.1.0"


def _tune_data_context() -> None:
    """Engine-level Ray Data context tuning, applied once at import.

    ``join_operator_actor_num_cpus_per_partition_override``: Ray 2.49's
    hash-shuffle join reserves 0.125 CPU per partition per join for its
    aggregator actors, and the streaming executor starts EVERY fused
    operator's actor pool up front. A plan that fuses several joins
    (e.g. the keyed winner path in stages/dedup._drop_losers_keyed:
    members⋈labels, with_label⋈winners, ds⋈losers, plus the
    connected-components join upstream) therefore reserves
    joins × partitions × 0.125 CPUs before a single map task can run —
    at 16 partitions on an 8-CPU cluster that is 4 × 16 × 0.125 = 8.0
    CPUs, a deterministic whole-cluster starvation deadlock (reproduced:
    embeddings_semdedup_keep hangs forever in get_output_blocking).
    0.02 keeps the same worst case at ~1.3 CPUs of reservation while
    aggregators — which mostly buffer partitions and then join them in
    finalize tasks — still get scheduled; on multi-node clusters the
    SPREAD strategy distributes them regardless of the reservation.
    Respected only if the embedding application has not already set it.
    """
    import ray.data

    ctx = ray.data.DataContext.get_current()
    if ctx.join_operator_actor_num_cpus_per_partition_override is None:
        ctx.join_operator_actor_num_cpus_per_partition_override = 0.02


_tune_data_context()
