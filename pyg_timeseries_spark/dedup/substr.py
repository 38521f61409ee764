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
    # The min(struct(id, pos)) winner per hash IS the kept occurrence —
    # no join back onto the chunk rows is needed (the old rendition
    # re-exploded the corpus a second time and shuffled every chunk's
    # TEXT through that join).  Chunk text now never rides any exchange:
    # the explode hashes each chunk map-side and ships (h, id, pos) only;
    # the kept set reduces to per-doc sorted POSITION arrays (ints); and
    # the surviving text rebuilds from the document's own words at those
    # positions after one equi-join of the docs table by id — the single
    # shuffle the payload pays (guide §8: decide on small rows, move the
    # heavy bytes once).
    ch = doc_chunks(df, w, text, id_col).select(
        F.md5(F.col("chunk")).alias("h"), "id", "pos"
    )
    firsts = ch.groupBy("h").agg(
        F.min(F.struct("id", "pos")).alias("__first")
    )
    kept = firsts.select(
        F.col("__first.id").alias("id"), F.col("__first.pos").alias("pos")
    )
    per_doc = kept.groupBy("id").agg(
        F.sort_array(F.collect_list("pos")).alias("__poss"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    # totals + rebuild inputs from a narrow map over the original docs
    words = F.split(F.trim(F.col(text)), r"\s+")
    totals = df.select(
        F.col(id_col).alias("id"),
        F.col(text).alias("__t"),
        F.when(
            F.coalesce(F.length(F.trim(F.col(text))), F.lit(0)) == 0, F.lit(0)
        ).otherwise(F.ceil(F.size(words) / F.lit(w))).cast("long").alias("n_chunks"),
    )
    # the words array is _let-bound: the per-position lambda below slices
    # an EVALUATED array instead of re-running split per kept position
    from pyg_timeseries_spark.dedup.neardup import _let

    rebuilt = _let(
        F.split(F.trim(F.col("__t")), r"\s+"),
        lambda wa: F.array_join(
            F.transform(
                F.col("__poss"),
                lambda p: F.array_join(F.slice(wa, p * w + 1, w), " "),
            ),
            " ",
        ),
    )
    return (
        totals.join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("__poss").isNotNull(), rebuilt)
            .otherwise(F.lit("")).alias(out),
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )
