"""TF-IDF document keyword extraction — top-k terms per document.

A training-data-pipeline staple the reference lacks (its candidate
features come from a torch bi-encoder, `el_main.py`; this is the classic
sparse counterpart). Built from the repo's standard shapes — nothing
driver-side:

1. per-batch Arrow tf explode: ``split_pattern`` (same tokenizer as
   `word_freq_top20` / DuckDB ``string_split``) → in-batch
   ``group_by([doc, term])`` → (doc_id, term, tf) rows;
2. document frequency: per-batch term partials → bucketed Arrow
   groupby-sum (64 coarse groups — each tf row counts its doc once, so
   summing tf-row counts per term IS the document frequency);
3. one distributed hash join tf ⋈ df on term (both sides slim int/str
   columns; the shuffle key is the term);
4. score = round(tf · ln(N / df), 6) as a vectorized Arrow kernel —
   the same rounded-``ln`` surface the `part_link_boost` oracle proved
   hash-stable between Arrow and DuckDB;
5. deterministic top-k per doc via :func:`..stages.rank.topn_per_group`
   (score DESC, term ASC — row_number semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def term_frequencies(ds: ray.data.Dataset, *, id_col: str = "doc_id",
                     col: str = "text") -> ray.data.Dataset:
    """→ (id, term, tf: int64) — one row per distinct term per document.
    Pure Arrow kernels; documents are rows, so tf never crosses blocks."""

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[col], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        rep = pa.array(np.repeat(np.arange(len(b), dtype=np.int64),
                                 lens.astype(np.int64)), pa.int64())
        flat = pa.table({id_col: b[id_col].take(rep),
                         "term": pc.list_flatten(toks)})
        return (flat.group_by([id_col, "term"])
                .aggregate([([], "count_all")])
                .rename_columns([id_col, "term", "tf"]))

    return ds.map_batches(explode, batch_format="pyarrow")


def document_frequencies(tf: ray.data.Dataset) -> ray.data.Dataset:
    """→ (term, df: int64) from tf rows (each (doc, term) row counts its
    document exactly once). Bucketed Arrow groupby-sum — the shuffle
    moves per-block partials, and the merge is 64 vectorized groups."""

    def part(b: pa.Table) -> pa.Table:
        import pandas as pd

        t = (b.select(["term"]).group_by("term")
             .aggregate([([], "count_all")]).rename_columns(["term", "c"]))
        # deterministic vectorized string hash (fixed siphash key)
        hb = pd.util.hash_array(t["term"].to_numpy(zero_copy_only=False)) % 64
        return t.append_column("__hb", pa.array(hb.astype(np.int64), pa.int64()))

    def merge(g: pa.Table) -> pa.Table:
        return (g.select(["term", "c"]).group_by("term")
                .aggregate([("c", "sum")]).rename_columns(["term", "df"]))

    return (tf.map_batches(part, batch_format="pyarrow")
            .groupby("__hb").map_groups(merge, batch_format="pyarrow"))


def tfidf_top_terms(ds: ray.data.Dataset, *, id_col: str = "doc_id",
                    col: str = "text", k: int = 3,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """→ (id, rn: 1..k, term, score, tf, df) — the k highest-TF-IDF terms
    per document, score = round(tf · ln(N/df), 6), ties by term ASC."""
    from .rank import topn_per_group

    n_docs = ds.count()
    # materialize: tf feeds BOTH the df pass and the join, and Ray
    # replays lineage per consumer — without this the tokenize/explode
    # runs twice. The tf table is the tokenized corpus, so this trades
    # object-store space (spillable) for a full second scan.
    tf = term_frequencies(ds, id_col=id_col, col=col).materialize()
    # repartition scrubs Ray-groupby untyped empty blocks before the join
    df = document_frequencies(tf).repartition(num_partitions)
    joined = tf.join(df, "inner", num_partitions,
                     on=("term",), right_on=("term",))

    def score(b: pa.Table) -> pa.Table:
        idf = pc.ln(pc.divide(pa.scalar(float(n_docs)),
                              pc.cast(b["df"], pa.float64())))
        sc = pc.round(pc.multiply(pc.cast(b["tf"], pa.float64()), idf), 6,
                      round_mode="half_towards_infinity")
        return pa.table({id_col: b[id_col], "term": b["term"],
                         "tf": b["tf"], "df": b["df"], "score": sc})

    scored = joined.map_batches(score, batch_format="pyarrow")
    return topn_per_group(scored, key_col=id_col, order_col="score",
                          id_col="term", n=k, keep_cols=("tf", "df"))


def bigram_novelty(ds: ray.data.Dataset, *, id_col: str = "doc_id",
                   col: str = "text",
                   num_partitions: int = 16) -> ray.data.Dataset:
    """→ (id, n_bigrams, df_sum, unique_bigrams) — the CCNet-style rare-
    n-gram novelty signal: how ordinary a document's word bigrams are
    across the corpus. ``n_bigrams`` = the doc's DISTINCT bigram count,
    ``df_sum`` = Σ corpus document-frequency over those bigrams (low ⇒
    novel/noisy text, high ⇒ boilerplate), ``unique_bigrams`` = how many
    appear in no other document. All-integer arithmetic — exact under
    the DuckDB value-hash oracle (no float log surface).

    Same two-pass broadcastless shape as :func:`tfidf_top_terms`:
    in-batch vectorized bigram explode + dedup, bucketed Arrow groupby
    for the global df, ONE hash join back on the bigram, then a
    combiner-collapsed per-doc sum. Docs with fewer than two tokens have
    no bigrams and are absent from the output (inner semantics, mirrored
    by the oracle SQL)."""
    from ray.data.aggregate import Sum

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[col], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        rep = np.repeat(np.arange(len(b), dtype=np.int64),
                        lens.astype(np.int64))
        flat = pc.list_flatten(toks).combine_chunks()
        n = len(flat)
        if n < 2:
            return pa.table({id_col: pa.array([], b[id_col].type),
                             "bg": pa.array([], pa.string())})
        left = flat.slice(0, n - 1)
        right = flat.slice(1, n - 1)
        bg = pc.binary_join_element_wise(left, right, " ")
        same_doc = rep[:-1] == rep[1:]
        t = pa.table({id_col: b[id_col].take(pa.array(rep[:-1][same_doc])),
                      "bg": pa.array(bg.to_numpy(zero_copy_only=False)
                                     [same_doc], pa.string())})
        # in-batch distinct (docs are row-local, so this IS per-doc distinct)
        return (t.group_by([id_col, "bg"]).aggregate([])
                .select([id_col, "bg"]))

    grams = ds.map_batches(explode, batch_format="pyarrow").materialize()
    df = (document_frequencies(grams.rename_columns({"bg": "term"}))
          .rename_columns({"term": "bg"})
          .repartition(num_partitions))
    joined = grams.join(df, "inner", num_partitions,
                        on=("bg",), right_on=("bg",))

    def part(b: pa.Table) -> pa.Table:
        dfv = b["df"].to_numpy(zero_copy_only=False)
        t = pa.table({
            id_col: b[id_col],
            "n_bigrams": pa.array(np.ones(len(b), np.int64)),
            "df_sum": b["df"],
            "unique_bigrams": pa.array((dfv == 1).astype(np.int64)),
        })
        return (t.group_by(id_col).aggregate(
            [("n_bigrams", "sum"), ("df_sum", "sum"),
             ("unique_bigrams", "sum")])
            .rename_columns([id_col, "n_bigrams", "df_sum",
                             "unique_bigrams"]))

    return (joined.map_batches(part, batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(Sum("n_bigrams", alias_name="n_bigrams"),
                       Sum("df_sum", alias_name="df_sum"),
                       Sum("unique_bigrams", alias_name="unique_bigrams")))
