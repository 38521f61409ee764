"""Sub-document exact deduplication at fixed word-chunk granularity — the
scalable Spark analog of exact-substring dedup (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better", dedup
repeated ≥50-token spans with a suffix array; RefinedWeb/CCNet do the
line/paragraph-level variant).  A single-node suffix array over 100 TB
does not distribute; the standard scalable rendition is NON-OVERLAPPING
fixed-width chunks: split each document into w-word chunks, keep only
the corpus-wide FIRST occurrence of each distinct chunk (smallest
(doc_id, position)), and reassemble documents from their surviving
chunks.  Repeated boilerplate spans longer than w words are removed
wherever they recur; spans shorter than w survive (granularity
tradeoff, same as the paper's w=50 floor).

Scale shape: the chunk table carries (hash, doc_id, pos) only — text
never shuffles with it.  First-occurrence election is a map-side-partial
``min(struct(doc_id, pos))`` per chunk hash — NOT a row_number window,
whose per-key sort would hot-spot on mega-duplicated boilerplate chunks
(the exact skew this operator exists to find).  Reassembly is one
groupBy(doc_id) over kept chunks.  Two shuffles total, both on uniform
keys (hash / doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_chunks(df: DataFrame, w: int = 10, text: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, pos, chunk) — non-overlapping ``w``-word chunks per document,
    pos = 0-based chunk index.  The trailing partial chunk (< w words) is
    kept as its own (shorter) chunk."""
    words = F.split(F.trim(F.col(text)), r"\s+")
    n_chunks = F.ceil(F.size(words) / F.lit(w)).cast("int")
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
                    lambda i: F.array_join(
                        F.slice(words, i * w + 1, w), " "
                    ),
                )
            ).alias("pos", "chunk"),
        )
        .filter(F.col("chunk") != "")
    )


def chunk_dedup(
    df: DataFrame,
    w: int = 10,
    text: str = "text",
    id_col: str = "doc_id",
    out: str = "text_dedup",
) -> DataFrame:
    """Per document: (id_col, out, n_chunks, n_kept) where ``out`` is the
    document's text rebuilt from only the chunks whose corpus-wide first
    occurrence (lexicographically smallest (doc_id, pos)) lies in this
    document at this position.  A document made entirely of previously
    seen chunks comes back with empty text (n_kept = 0) — candidates for
    dropping wholesale."""
    ch = doc_chunks(df, w, text, id_col).withColumn(
        "h", F.md5(F.col("chunk"))
    )
    firsts = ch.groupBy("h").agg(
        F.min(F.struct("id", "pos")).alias("__first")
    )
    kept = (
        ch.join(firsts, "h")
        .filter(
            (F.col("__first.id") == F.col("id"))
            & (F.col("__first.pos") == F.col("pos"))
        )
        .select("id", "pos", "chunk")
    )
    per_doc = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s.getField("chunk"),
            ),
            " ",
        ).alias(out),
        F.count(F.lit(1)).alias("n_kept"),
    )
    # chunk totals from a narrow map over the original docs — cheaper than
    # re-exploding the corpus a second time
    words = F.split(F.trim(F.col(text)), r"\s+")
    totals = df.select(
        F.col(id_col).alias("id"),
        F.when(
            F.coalesce(F.length(F.trim(F.col(text))), F.lit(0)) == 0, F.lit(0)
        ).otherwise(F.ceil(F.size(words) / F.lit(w))).cast("long").alias("n_chunks"),
    )
    return (
        totals.join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col(out), F.lit("")).alias(out),
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )
