"""S9: Wikidata JSON-dump reader (bz2 line-delimited JSON array).

Reference (``candidate_retrieval/process_wikidata.py:48-99``): stream the
bz2 dump line by line, parse each line as one entity JSON object (stripping
the array-syntax trailing comma, skipping the ``[`` / ``]`` array frame),
keep only entities with an ``enwiki`` sitelink, and project
(id, title, en aliases, en label, en description, enwikiquote title).

Ray-Data-first: every line is an independent record, so this is one
``read_text`` → ``map_batches`` parse — no driver loop, no two-pass line
count, no in-memory dict of the whole dump. bz2 files decompress whole-file
per read task (compressed streams aren't splittable); parallelism comes
from the shard count of the dump.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

WIKIDATA_SCHEMA = pa.schema([
    ("wikidata_id", pa.string()),
    ("title", pa.string()),
    ("aliases", pa.list_(pa.string())),
    ("wikidata_label", pa.string()),
    ("description", pa.string()),
    ("enwikiquote_title", pa.string()),
])


def parse_wikidata_lines(lines: list[str]) -> pa.Table:
    """Lines → WIKIDATA_SCHEMA batch (process_wikidata.py:55-88 semantics:
    enwiki-sitelink filter, en-language projections, None for absences)."""
    out = {k: [] for k in WIKIDATA_SCHEMA.names}
    for line in lines:
        line = line.strip().strip(",")
        if not line or line in ("[", "]"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue  # reference logs & skips malformed lines (:90-99)
        sitelinks = obj.get("sitelinks") or {}
        if "enwiki" not in sitelinks:
            continue
        aliases = obj.get("aliases") or {}
        labels = obj.get("labels") or {}
        descriptions = obj.get("descriptions") or {}
        out["wikidata_id"].append(obj.get("id"))
        out["title"].append(sitelinks["enwiki"]["title"])
        out["aliases"].append(
            [a["value"] for a in aliases["en"]] if "en" in aliases else None)
        out["wikidata_label"].append(
            labels["en"]["value"] if "en" in labels else None)
        out["description"].append(
            descriptions["en"]["value"] if "en" in descriptions else None)
        out["enwikiquote_title"].append(
            sitelinks["enwikiquote"]["title"] if "enwikiquote" in sitelinks else None)
    return pa.table({n: pa.array(out[n], WIKIDATA_SCHEMA.field(n).type)
                     for n in WIKIDATA_SCHEMA.names})


def read_wikidata(paths: list[str] | str) -> ray.data.Dataset:
    """The S9 reader as a streaming Dataset (one row per enwiki-linked
    entity). ``.bz2`` paths decompress automatically via Arrow's
    extension-inferred codec."""
    lines = ray.data.read_text(paths)
    return lines.map_batches(
        lambda b: parse_wikidata_lines(b["text"].to_pylist()),
        batch_format="pyarrow")
