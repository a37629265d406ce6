"""Dataset sources for the engine's logical tables.

The production layout is Lance (per BASELINE.json input_hint); the ``lance``
package is not shipped in this sandbox, so every reader import-tries lance
and falls back to parquet with the identical schema. Reference analogues:
S1-S4 JSONL readers (``entity_candidate/main_dense.py:99-207``,
``entity_sort/el_process.py:28-44``) — re-expressed as columnar reads with
projection pushdown instead of driver-resident dict builds.
"""

from __future__ import annotations

import os

import ray.data

try:  # pragma: no cover - lance not in this sandbox
    import lance  # noqa: F401

    _HAVE_LANCE = True
except ImportError:
    _HAVE_LANCE = False


def read_table(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a logical table from a Lance dataset dir or a parquet file/dir.

    ``columns`` prunes at the read (row-group/column pushdown) — callers
    must pass only what the pipeline needs.
    """
    if _HAVE_LANCE and (os.path.isdir(path) and os.path.exists(os.path.join(path, "_versions"))):
        return ray.data.read_lance(path, columns=columns)  # pragma: no cover
    return ray.data.read_parquet(path, columns=columns)


def read_documents(path: str) -> ray.data.Dataset:
    return read_table(path, columns=["doc_id", "spans"])


def read_entities(path: str) -> ray.data.Dataset:
    return read_table(path)


def read_jsonl(path: str) -> ray.data.Dataset:
    """S1/S2-style JSONL reader (``json.loads`` per line — never ``eval``,
    unlike reference ``el_process.py:33``)."""
    return ray.data.read_json(path)
