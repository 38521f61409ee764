"""Reindexing a melted tensor onto a new time axis — the long-format
rendition of the reference's ``reindex_3d`` (/root/reference/src/
pyg_timeseries/_pandas.py:67-79), which realigns a (t, m, m) correlation
tensor to a target index with optional forward-fill.

In long format the (t, m, m) tensor is rows (ts, key_i, key_j, val), so
reindexing is an AS-OF join: every target timestamp picks each pair's
latest row at-or-before it (method='ffill') or its exact row
(method=None).  Implemented with the union + last_value(IGNORE NULLS)
window pattern — one shuffle on the pair key, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reindex_melted(
    tensor: DataFrame,
    index_df: DataFrame,
    ts: str = "ts",
    val: str = "cor",
    pair_cols: tuple[str, str] = ("key_i", "key_j"),
    method: str | None = "ffill",
) -> DataFrame:
    """Rows (ts, key_i, key_j, val) for EVERY ts in ``index_df`` × every
    pair present in ``tensor``; ``method='ffill'`` carries the latest
    at-or-before value, ``None`` keeps exact matches only (NULL elsewhere).
    """
    ki, kj = pair_cols
    pairs = tensor.select(ki, kj).distinct()
    grid = index_df.select(ts).distinct().crossJoin(pairs)
    if method is None:
        return grid.join(tensor, on=[ts, ki, kj], how="left")
    src = tensor.select(ts, ki, kj, F.col(val).alias("_v")).withColumn(
        "_is_src", F.lit(1)
    )
    tgt = grid.withColumn("_v", F.lit(None).cast(src.schema["_v"].dataType)) \
              .withColumn("_is_src", F.lit(0))
    both = src.unionByName(tgt)
    # source rows order BEFORE target rows at the same ts, so an exact-match
    # timestamp is visible to its target row
    w = (
        Window.partitionBy(ki, kj)
        .orderBy(F.col(ts), F.col("_is_src").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.withColumn("_f", F.last("_v", ignorenulls=True).over(w))
    return (
        filled.filter(F.col("_is_src") == 0)
        .select(ts, ki, kj, F.col("_f").alias(val))
    )


# name-parity alias with the reference export
reindex_3d = reindex_melted
