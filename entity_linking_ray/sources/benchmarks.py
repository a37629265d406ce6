"""S15 benchmark-dataset readers: the tab-delimited mention/candidate CSV
and the CoNLL token-stream format, Ray-Data-first.

Reference semantics (``entity_candidate/candidate_retrieval/dataset.py``):

- ``read_csv_file`` (dataset.py:18-69): one mention per TAB-separated line —
  ``doc_key  doc_part  mention  lctx  rctx  _  cand1 ... candN  _  gold``.
  ``doc_name = doc_key + " " + doc_part``; each candidate cell is
  ``id,prior,name...`` (the name may itself contain commas); ``EMPTYCAND``
  means no candidates; the gold cell drops 2 or 3 leading fields depending
  on a ``-1`` sentinel. Names normalize ``"`` → ``%22`` and space → ``_``.
- ``read_conll_file`` (dataset.py:73-109): ``-DOCSTART- (docname...`` doc
  headers, one token per line, blank line = sentence break; columns
  ``tok  B|I  _  _  wikilink  ...`` mark mention spans (B opens, I extends).

Both re-expressed as streaming Datasets: mention lines parse per batch
(each line is independent — embarrassingly parallel); CoNLL is stateful
across lines, so files are read WHOLE-FILE-PER-TASK (`read_binary_files`)
exactly like :func:`..stages.linkage.read_doc_stream` — a doc can never
straddle parser instances, and parallelism comes from the file count.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

CAND_STRUCT = pa.struct([("entity", pa.string()), ("prior", pa.float64())])

MENTIONS_SCHEMA = pa.schema([
    ("doc_name", pa.string()),
    ("mention", pa.string()),
    ("context_left", pa.string()),
    ("context_right", pa.string()),
    ("candidates", pa.list_(CAND_STRUCT)),
    ("gold_entity", pa.string()),
])

CONLL_MENTION_STRUCT = pa.struct([
    ("sent_id", pa.int32()), ("start", pa.int32()), ("end", pa.int32()),
    ("wikilink", pa.string()),
])

CONLL_SCHEMA = pa.schema([
    ("doc_name", pa.string()),
    ("sentences", pa.list_(pa.list_(pa.string()))),
    ("mentions", pa.list_(CONLL_MENTION_STRUCT)),
])


def _norm_name(name: str) -> str:
    # dataset.py:32 — quote and space normalization for entity names
    return name.replace('"', "%22").replace(" ", "_")


def parse_mention_lines(lines: list[str]) -> pa.Table:
    """Tab-delimited mention lines → MENTIONS_SCHEMA batch (dataset.py:18-69
    semantics, including the comma-containing-name reassembly)."""
    out = {k: [] for k in MENTIONS_SCHEMA.names}
    for line in lines:
        line = line.strip("\n")
        if not line.strip():
            continue
        comps = line.strip().split("\t")
        out["doc_name"].append(comps[0] + " " + comps[1])
        out["mention"].append(comps[2])
        out["context_left"].append(comps[3])
        out["context_right"].append(comps[4])
        if comps[6] != "EMPTYCAND":
            cands = [c.split(",") for c in comps[6:-2]]
            out["candidates"].append(
                [{"entity": _norm_name(",".join(c[2:])), "prior": float(c[1])}
                 for c in cands])
        else:
            out["candidates"].append([])
        gold = comps[-1].split(",")
        skip = 2 if gold[0] == "-1" else 3  # dataset.py:39-50
        out["gold_entity"].append(_norm_name(",".join(gold[skip:])))
    return pa.table(
        {name: pa.array(out[name], MENTIONS_SCHEMA.field(name).type)
         for name in MENTIONS_SCHEMA.names})


def read_benchmark_mentions(paths: list[str] | str) -> ray.data.Dataset:
    """The S15 CSV reader as a streaming Dataset: one row per mention.
    Lines are independent, so ``read_text``'s size-based blocks are safe
    here (unlike the CoNLL reader below)."""
    lines = ray.data.read_text(paths)
    return lines.map_batches(
        lambda b: parse_mention_lines(b["text"].to_pylist()),
        batch_format="pyarrow")


def parse_conll_text(text: str) -> pa.Table:
    """One CoNLL file's content → CONLL_SCHEMA batch (dataset.py:73-109)."""
    docs: list[dict] = []
    cur: dict | None = None
    sent: list[str] = []
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("-DOCSTART-"):
            if cur is not None:
                if sent:
                    cur["sentences"].append(sent)
                docs.append(cur)
            # "-DOCSTART- (docname..." → name token minus the "(" prefix
            cur = {"doc_name": line.split()[1][1:],
                   "sentences": [], "mentions": []}
            sent = []
        elif cur is not None:
            if line == "":
                cur["sentences"].append(sent)
                sent = []
            else:
                comps = line.split("\t")
                sent.append(comps[0])
                if len(comps) >= 6:
                    if comps[1] == "I":
                        cur["mentions"][-1]["end"] += 1
                    else:
                        cur["mentions"].append({
                            "sent_id": len(cur["sentences"]),
                            "start": len(sent) - 1,
                            "end": len(sent),
                            "wikilink": comps[4],
                        })
    if cur is not None:
        if sent:
            cur["sentences"].append(sent)
        docs.append(cur)
    return pa.table({
        "doc_name": pa.array([d["doc_name"] for d in docs], pa.string()),
        "sentences": pa.array([d["sentences"] for d in docs],
                              pa.list_(pa.list_(pa.string()))),
        "mentions": pa.array([d["mentions"] for d in docs],
                             pa.list_(CONLL_MENTION_STRUCT)),
    })


def read_conll(paths: list[str] | str) -> ray.data.Dataset:
    """CoNLL reader: whole-file-per-task (docs are stateful across lines —
    the same boundary-safety contract as read_doc_stream)."""

    def parse_files(batch: pa.Table) -> pa.Table:
        tables = [parse_conll_text(data.as_py().decode("utf-8", "replace"))
                  for data in batch["bytes"]]
        return pa.concat_tables(tables) if tables else parse_conll_text("")

    files = ray.data.read_binary_files(paths)
    return files.map_batches(parse_files, batch_format="pyarrow")


def attach_conll_text(mentions: ray.data.Dataset,
                      conll: ray.data.Dataset) -> ray.data.Dataset:
    """Broadcast map-join of CoNLL doc text onto benchmark mentions by the
    doc key (the first token of ``doc_name`` — dataset.py:114). The CoNLL
    side is dimension-shaped (hundreds of docs), so it broadcasts via
    ``ray.put`` once; each mention row gains the doc's flattened sentences
    as ``doc_tokens``."""
    lut = {
        row["doc_name"]: [tok for s in row["sentences"] for tok in s]
        for row in conll.take_all()
    }
    lut_ref = ray.put(lut)

    def attach(batch: pa.Table) -> pa.Table:
        m = ray.get(lut_ref)
        toks = [m.get(dn.split()[0], []) for dn in batch["doc_name"].to_pylist()]
        return batch.append_column(
            "doc_tokens", pa.array(toks, pa.list_(pa.string())))

    return mentions.map_batches(attach, batch_format="pyarrow")
