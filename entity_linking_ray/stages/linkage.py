"""Two-pass linkage join (reference J4/J5) and the wiki-style stream
parser family (S6/S7/S8), re-expressed Ray-Data-first.

- :func:`two_pass_join` — reference ``link_wikipedia_and_wikidata.py:
  76-119``: left join on a primary key, then a FALLBACK join of the
  unmatched remainder on a secondary key; reports matched/unmatched
  counts per pass. Implemented as broadcast map-side joins (both lookup
  sides are dimension-shaped); the shuffle-join variant is the standard
  swap when the right side outgrows RAM.
- :func:`parse_doc_stream` — reference ``process_wiki_extractor_output
  .py:51-91`` (+_full/_links variants): a text stream of
  ``<doc id=...>...</doc>`` blocks → one row per doc with title, intro
  line, full text, token count, and extracted links. Stateful WITHIN a
  batch only: each input file is one block (``read_text`` per file), so
  doc boundaries never straddle tasks — the partitioning assumption the
  reference's sequential parser gets for free and we document.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray
import ray.data

_DOC_OPEN = re.compile(r'<doc id="(?P<id>[^"]+)"(?:\s+title="(?P<title>[^"]*)")?[^>]*>')
_LINK = re.compile(r'<a href="(?P<href>[^"]+)"[^>]*>(?P<anchor>.*?)</a>', re.S)


def two_pass_join(left: ray.data.Dataset, primary_map: dict, fallback_map: dict,
                  key_col: str, fallback_key_col: str,
                  out_col: str = "matched_id") -> tuple[ray.data.Dataset, dict]:
    """Adds ``out_col``: primary_map[key] else fallback_map[fallback_key]
    else null. Returns (dataset, stats placeholder); match counts are
    emitted per batch as columns aggregated by the caller if needed."""
    p_ref = ray.put(primary_map)
    f_ref = ray.put(fallback_map)

    def join(batch: pa.Table) -> pa.Table:
        p = ray.get(p_ref)
        f = ray.get(f_ref)
        keys = batch[key_col].to_pylist()
        fkeys = batch[fallback_key_col].to_pylist()
        out, via = [], []
        for k, fk in zip(keys, fkeys):
            v = p.get(k)
            if v is not None:
                out.append(v)
                via.append("primary")
            else:
                v2 = f.get(fk)
                out.append(v2)
                via.append("fallback" if v2 is not None else "unmatched")
        return batch.append_column(out_col, pa.array(out, pa.string())) \
                    .append_column("join_via", pa.array(via, pa.string()))

    return left.map_batches(join, batch_format="pyarrow"), {}


def _parse_doc_lines(lines: list[str]) -> pa.Table:
    """Sequential ``<doc …>…</doc>`` parser over a COMPLETE line sequence.
    Raises if the sequence ends inside a doc block — the caller is
    responsible for never splitting a file across parser instances."""
    out = {"doc_id": [], "title": [], "intro": [], "num_tokens": [], "links": []}
    cur_id = cur_title = None
    cur_lines: list[str] = []
    for line in lines:
        m = _DOC_OPEN.match(line.strip())
        if m:
            cur_id = m.group("id")
            cur_title = m.group("title") or ""
            cur_lines = []
            continue
        if line.strip() == "</doc>":
            body = "\n".join(cur_lines)
            intro = next((l for l in cur_lines if l.strip()), "")
            links = [mm.group("href") for mm in _LINK.finditer(body)]
            clean = _LINK.sub(lambda mm: mm.group("anchor"), body)
            out["doc_id"].append(cur_id)
            out["title"].append(cur_title)
            out["intro"].append(intro)
            out["num_tokens"].append(len(clean.split()))
            out["links"].append(links)
            cur_id = None
            continue
        if cur_id is not None:
            cur_lines.append(line)
    if cur_id is not None:
        # a block boundary split a <doc> — silent drop would lose documents
        raise ValueError(
            f"truncated <doc id={cur_id!r}> block: the input was split "
            "mid-document. Read file-per-task (use read_doc_stream) instead "
            "of a line reader that may split large files across blocks."
        )
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.string()),
        "title": pa.array(out["title"], pa.string()),
        "intro": pa.array(out["intro"], pa.string()),
        "num_tokens": pa.array(out["num_tokens"], pa.int64()),
        "links": pa.array(out["links"], pa.list_(pa.string())),
    })


def parse_doc_stream(lines: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Line dataset → rows (doc_id, title, intro, num_tokens, links:
    list<string>). S6 intro extraction + S7 token count + S8 link
    extraction in one pass.

    batch_size=None gives one task per BLOCK, but ``read_text`` may split a
    large file into several blocks; a doc straddling a block boundary now
    FAILS LOUDLY instead of being silently dropped. For large files use
    :func:`read_doc_stream`, which reads whole-file-per-row and can never
    split a document."""
    return lines.map_batches(
        lambda b: _parse_doc_lines(b[text_col].to_pylist()),
        batch_format="pyarrow", batch_size=None,
    )


def read_doc_stream(paths: list[str] | str) -> ray.data.Dataset:
    """Whole-file-per-task doc-stream reader: ``read_binary_files`` yields
    one row per FILE (never split, unlike read_text's size-based blocks),
    so ``<doc>`` blocks cannot straddle parser instances by construction.
    Parallelism comes from the file count — the natural sharding for
    WikiExtractor-style output directories."""

    def parse_files(batch: pa.Table) -> pa.Table:
        tables = [
            _parse_doc_lines(data.as_py().decode("utf-8", "replace").splitlines())
            for data in batch["bytes"]
        ]
        return pa.concat_tables(tables) if tables else _parse_doc_lines([])

    files = ray.data.read_binary_files(paths)
    return files.map_batches(parse_files, batch_format="pyarrow")


def incoming_link_counts(parsed: ray.data.Dataset) -> ray.data.Dataset:
    """G1: explode links → per-target counts + log boost
    (enrich_data.py:79-164)."""
    import pyarrow.compute as pc

    from .agg import bucketed_agg

    def explode(batch: pa.Table) -> pa.Table:
        lst = batch["links"].combine_chunks()
        return pa.table({"target": lst.flatten()})

    # bucketed count: target cardinality is KB-scale (stages/agg.py —
    # the per-batch combiner lives inside bucketed_agg)
    counts = bucketed_agg(
        parsed.map_batches(explode, batch_format="pyarrow"),
        "target", [("target", "count", "num_incoming_links")])

    def boost(batch: pa.Table) -> pa.Table:
        b = pc.ln(pc.add(pc.cast(batch["num_incoming_links"], pa.float64()), 1.0))
        return batch.append_column("boost", b)

    return counts.map_batches(boost, batch_format="pyarrow")
