"""Sinks: partitioned parquet (the checkpoint layout), JSONL, plain text.

Reference analogues: S10 batched Solr ingestion (10k docs/commit,
``data_ingestion.py:157-183``) → partitioned parquet with bounded file
rows; S11 JSONL writer (``entity_candidate/utils.py:110-117``); S12 pickle
artifact store → the lineage/checkpoint layout in state/checkpoint.py.
"""

from __future__ import annotations

import os

import ray.data


def write_parquet_partitioned(ds: ray.data.Dataset, out_dir: str,
                              rows_per_file: int = 500_000) -> str:
    """Directory-of-part-files sink (resumable layout; never one giant
    file). ``rows_per_file`` is the S10 batch-size analogue."""
    os.makedirs(out_dir, exist_ok=True)
    try:
        ds.write_parquet(out_dir, min_rows_per_file=rows_per_file)
    except TypeError:  # older Ray releases
        ds.write_parquet(out_dir, num_rows_per_file=rows_per_file)
    return out_dir


def write_lance(ds: ray.data.Dataset, out_path: str,
                max_rows_per_file: int = 500_000) -> str:
    """Lance sink mirroring :func:`write_parquet_partitioned` — the
    BASELINE.json production layout (Lance interleaved documents),
    executable wherever the ``lance`` package ships; this sandbox lacks
    it, so callers import-try (the reader side already falls back the
    same way, documents.py:17)."""
    try:
        import lance  # noqa: F401
    except ImportError as exc:  # pragma: no cover - lance not in sandbox
        raise NotImplementedError(
            "write_lance needs the 'lance' package (not in this "
            "container); use write_parquet_partitioned — identical "
            "layout semantics") from exc
    ds.write_lance(out_path, max_rows_per_file=max_rows_per_file)
    return out_path


def write_jsonl(ds: ray.data.Dataset, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    return out_dir


def read_text_lines(path: str) -> ray.data.Dataset:
    """S5 plain-text reader: one stripped line per row."""
    return ray.data.read_text(path)
