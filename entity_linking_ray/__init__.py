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
