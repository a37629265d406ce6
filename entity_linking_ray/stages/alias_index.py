"""Alias-table (blocking index) build — the reference's KB build as a
Ray pipeline.

Reference: ``entity_sort/el_process.py:19-44`` builds ``entity_to_ids``
(alias → [subject_id...]) by exploding each KB row's alias list, deduping
with ``set`` (D1) and sorting aliases by length desc (T5). Here:

- entities Dataset → ``flat_map``-style explode in ``map_batches`` (keeps
  block sizes bounded for entities with huge alias lists, SURVEY.md §7
  hard-part 6) → normalize → exact dedup via ``groupby.first`` equivalent
  (distinct on (norm_alias, entity_id)).
- The description column (M7) is synthesized once here instead of being
  recomputed in three places like the reference.

For the broadcast lookup used by candidate generation the index is
collapsed driver-side into a dict — valid while the KB (5.9M entities ≈
low-GB) fits in worker RAM, which is the reference's own operating point
(``el_service.py:33-40`` holds the same dicts in one process). The
shuffle-join path (J1 as a real co-partitioned join on norm_alias) is what
replaces it when the KB outgrows RAM.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from ..functions.describe import synthesize_description
from ..functions.normalize import normalize_array


def explode_aliases(batch: pa.Table) -> pa.Table:
    """entities batch → (norm_alias, entity_id) rows, per-batch deduped."""
    out_alias: list[str] = []
    out_eid: list[str] = []
    eids = batch["entity_id"].to_pylist()
    aliases = batch["aliases"].to_pylist()
    subjects = batch["subject"].to_pylist()
    for eid, subj, al in zip(eids, subjects, aliases):
        seen = set()
        for a in list(al or []) + [subj]:
            if a not in seen:
                seen.add(a)
                out_alias.append(a)
                out_eid.append(eid)
    t = pa.table({"norm_alias": pa.array(out_alias, pa.string()),
                  "entity_id": pa.array(out_eid, pa.string())})
    t = t.set_column(0, "norm_alias", normalize_array(t["norm_alias"]))
    # per-batch dedup (combiner); global dedup happens in the groupby
    return t.group_by(["norm_alias", "entity_id"]).aggregate([])


def build_alias_index(entities: ray.data.Dataset) -> ray.data.Dataset:
    """entities → alias_index(norm_alias, entity_id), globally distinct."""
    from .agg import bucketed_agg

    exploded = entities.map_batches(explode_aliases, batch_format="pyarrow")
    # global exact dedup (D1): one bucketed shuffle on the alias key
    # (KB-scale cardinality — stages/agg.py)
    return bucketed_agg(exploded, ["norm_alias", "entity_id"])


def add_description(batch: pa.Table) -> pa.Table:
    descs = [
        synthesize_description(s, ib or [])
        for s, ib in zip(batch["subject"].to_pylist(), batch["infobox"].to_pylist())
    ]
    return batch.append_column("description", pa.array(descs, pa.string()))


def collect_alias_dict(entities: ray.data.Dataset) -> dict[str, list[str]]:
    """Driver-side collapse of the alias index into alias → sorted [eid...]
    for ``ray.put`` broadcast (small-KB path)."""
    idx: dict[str, list[str]] = {}
    for batch in build_alias_index(entities).iter_batches(batch_format="pyarrow"):
        for a, e in zip(batch["norm_alias"].to_pylist(), batch["entity_id"].to_pylist()):
            idx.setdefault(a, []).append(e)
    for a in idx:
        idx[a].sort()
    return idx
