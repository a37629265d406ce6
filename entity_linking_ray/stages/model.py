"""Generic actor-pool model stage — the "real model drops in" protocol.

The reference loads its models once per long-lived service process and
reuses them across requests (``entity_sort/el_service.py:25-43``: BERT +
jieba dict constructed at service start, every request hits the resident
model). The Ray-Data analogue is an actor-pool ``map_batches`` stage whose
callable class constructs the model ONCE in ``__init__`` and applies it per
batch in ``__call__`` — this module makes that protocol explicit and
swappable, so the sandbox stand-ins (HashEmbedder in ``functions/embed.py``,
the calibrated scorer in ``stages/pairwise.py``) are replaced by a trained
model without touching any pipeline code.

Swap recipe (documented contract, verified by
``tests/test_model_stage.py``):

1. Write a factory — any zero-arg picklable callable returning the loaded
   model (e.g. ``lambda: SentenceTransformer(path)``); heavy weights go
   through ``ray.put`` once and the factory takes the ObjectRef.
2. Write an apply function ``(model, pa.Table) -> pa.Table`` — pure,
   vectorized over the batch.
3. ``model_map_batches(ds, factory, apply, concurrency=N, batch_size=B,
   num_cpus=c / num_gpus=g)``.

The factory runs exactly once per pool actor — NOT once per batch — which
is the property the integration test asserts with a construction-counting
dummy model.
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa

import ray
import ray.data


class ModelStage:
    """Callable class for ``map_batches``: builds the model once per actor.

    ``factory``: zero-arg callable → model object. If it is a
    ``ray.ObjectRef`` the referenced callable is fetched first (broadcast
    factories: ``ray.put`` the factory or its weights once on the driver;
    every actor reads it zero-copy from the object store instead of
    re-shipping per task).
    ``apply``: ``(model, batch: pa.Table) -> pa.Table``.
    """

    def __init__(self, factory: Callable[[], Any] | ray.ObjectRef,
                 apply: Callable[[Any, pa.Table], pa.Table] | ray.ObjectRef):
        if isinstance(factory, ray.ObjectRef):
            factory = ray.get(factory)
        if isinstance(apply, ray.ObjectRef):
            apply = ray.get(apply)
        self.model = factory()  # once per actor — the load-once contract
        self.apply = apply

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.apply(self.model, batch)


def model_map_batches(ds: ray.data.Dataset,
                      factory: Callable[[], Any],
                      apply: Callable[[Any, pa.Table], pa.Table],
                      *, concurrency: int | tuple = 4,
                      batch_size: int = 256,
                      num_cpus: float = 1,
                      num_gpus: float = 0) -> ray.data.Dataset:
    """Apply a model over a Dataset with load-once-per-actor semantics.

    ``concurrency`` is the pool size (int = fixed pool; tuple = autoscale
    bounds). Size ``concurrency × num_cpus`` (or ``num_gpus``) to the node:
    e.g. a GPU model uses ``num_gpus=1, concurrency=<#GPUs>`` so Ray places
    one resident model per device."""
    kwargs: dict[str, Any] = {}
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    return ds.map_batches(
        ModelStage,
        fn_constructor_kwargs={"factory": factory, "apply": apply},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        **kwargs,
    )
