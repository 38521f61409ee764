"""Exact deduplication: hash-groupBy on content.

At 100 TB the right shape is: project (hash, id) — column-pruned scan — then
one shuffle keyed by the 128-bit content hash (uniform, unskewed by
construction), keep min(id) per group.  Never shuffles the text payload;
survivors are recovered with a broadcast-free semi-join on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_groups(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: (h, cnt, keep_id)."""
    return (
        df.select(F.md5(F.col(text)).alias("h"), F.col(id_col))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(id_col).alias("keep_id"))
    )


def dedup_exact(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The deduplicated corpus (first doc per distinct text survives)."""
    keep = dedup_groups(df, text, id_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")
