"""Sequence packing for training-data pipelines — assign documents to
fixed-length training sequences.

Two standard strategies, both deterministic under a (key, doc) total order:

* ``pack_concat`` — the GPT-style pretraining layout: per key, documents
  concatenate in doc order into one token stream that splits every
  ``max_len`` tokens; documents straddle sequence boundaries.  This is a
  PURE window-plus-explode plan (exclusive prefix-sum of token counts →
  each doc's token span → one output row per overlapped sequence): no
  recurrence, no UDF, no driver state — at 100 TB it is a per-key window
  (sort-based, spillable) followed by a map, and the output is a packing
  MAP (doc slices), never a materialized token payload.

* ``pack_greedy`` — no-split packing (each document lands wholly in one
  sequence; a document that would overflow the open sequence closes it).
  Inherently a running recurrence, so it runs as the engine's standard
  per-key ``applyInPandas`` kernel; a group is one key's doc list (ids +
  counts only — bounded), never token payloads.

The reference engine has no packing operator; these extend the pipeline
the same way the dedup/similarity modules do (driver-oracled against
closed-form SQL: prefix sums for concat, a recursive CTE for greedy).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_concat(df: DataFrame, max_len: int, key: str = "source",
                doc: str = "doc_id", n: str = "n_tok") -> DataFrame:
    """Concat-and-chunk packing map.

    Returns one row per (document, sequence) overlap::

        (key, seq_id, doc, doc_start, doc_end, seq_off)

    meaning tokens ``[doc_start, doc_end)`` of ``doc`` occupy positions
    ``[seq_off, seq_off + doc_end - doc_start)`` of sequence ``seq_id``.
    Every sequence except each key's last is exactly ``max_len`` tokens.
    Zero-token documents are dropped (they occupy no span).
    """
    L = F.lit(max_len)
    w = (
        Window.partitionBy(key).orderBy(doc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        df.filter(F.col(n) > 0)
        .withColumn("_off", (F.sum(n).over(w) - F.col(n)).cast("long"))
    )
    first = F.floor(F.col("_off") / L).cast("long")
    last = F.floor((F.col("_off") + F.col(n) - 1) / L).cast("long")
    spans = d.select(
        key, doc, F.col(n).cast("long").alias("_n"), "_off",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    doc_start = F.greatest(F.col("seq_id") * L - F.col("_off"), F.lit(0))
    doc_end = F.least((F.col("seq_id") + 1) * L - F.col("_off"), F.col("_n"))
    return spans.select(
        key, "seq_id", doc,
        doc_start.alias("doc_start"),
        doc_end.alias("doc_end"),
        (F.col("_off") + doc_start - F.col("seq_id") * L).alias("seq_off"),
    )


def pack_greedy(df: DataFrame, max_len: int, key: str = "source",
                doc: str = "doc_id", n: str = "n_tok") -> DataFrame:
    """No-split greedy packing: walking docs in ``doc`` order per key, a doc
    joins the open sequence unless it would overflow ``max_len``, in which
    case it opens the next one.  A doc longer than ``max_len`` gets its own
    sequence (flagged by ``n > max_len`` in the output).  Returns
    ``(key, seq_id, seq_pos_off, doc, n)`` with ``seq_pos_off`` the doc's
    token offset inside its sequence."""
    key_field = next(f for f in df.schema.fields if f.name == key)
    doc_field = next(f for f in df.schema.fields if f.name == doc)
    out_schema = T.StructType(
        [
            key_field,
            T.StructField("seq_id", T.LongType()),
            T.StructField("seq_pos_off", T.LongType()),
            doc_field,
            T.StructField(n, T.LongType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(doc).reset_index(drop=True)
        seq, acc = 0, 0
        seqs, offs = [], []
        for cnt in pdf[n].astype("int64"):
            if acc > 0 and acc + cnt > max_len:
                seq += 1
                acc = 0
            seqs.append(seq)
            offs.append(acc)
            acc += int(cnt)
        return pd.DataFrame(
            {
                key: pdf[key],
                "seq_id": seqs,
                "seq_pos_off": offs,
                doc: pdf[doc],
                n: pdf[n].astype("int64"),
            }
        )

    return (
        df.filter(F.col(n) > 0)
        .select(key, doc, F.col(n).cast("long").alias(n))
        .groupBy(key)
        .applyInPandas(run, schema=out_schema)
    )


def pack_stats(packed: DataFrame, max_len: int, key: str = "source",
               n: str = "n_tok") -> DataFrame:
    """Per-key packing efficiency for a ``pack_greedy`` output: sequences,
    mean fill, and the padding fraction a trainer would waste."""
    per_seq = packed.groupBy(key, "seq_id").agg(F.sum(n).alias("fill"))
    return per_seq.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.avg("fill").alias("mean_fill"),
        (1 - F.sum("fill") / (F.count(F.lit(1)) * F.lit(max_len))).alias(
            "pad_frac"
        ),
    )


def shard_by_budget(
    df: DataFrame,
    budget: int,
    weight: str = "n_tokens",
    key: str = "source",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Assign each document to an export shard so every shard carries
    ~``budget`` total ``weight`` (tokens, chars, bytes): per key, order
    docs by the deterministic md5(doc_id) coin (the engine's corpus
    sampling convention), take the EXCLUSIVE running sum of weights, and
    shard_id = floor(cum / budget).  A document never splits; shards
    overflow by at most one document — the standard contiguous-fill
    layout for training-data export (cf. pack_concat's prefix-sum plan,
    which this reuses at document granularity).

    Scale shape: one per-key window cumsum — one Exchange, parallel
    across keys (shard files of a 100 TB corpus export per source in
    parallel; no global total order, which would serialize on one
    partition).  Emits (key, doc_id, weight, shard_id, cum_before)."""
    coin = F.md5(F.col(doc_id).cast("string"))
    w = (
        Window.partitionBy(key)
        .orderBy(coin, doc_id)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(weight).over(w), F.lit(0)).cast("long")
    return df.select(
        key, doc_id, F.col(weight).alias("weight"),
        cum.alias("cum_before"),
        F.floor(cum / F.lit(int(budget))).cast("long").alias("shard_id"),
    )
