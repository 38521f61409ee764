"""Mergeable distinct-count sketches for the rollup tiers: KMV
(k-minimum-values, Bar-Yossef et al. 2002 / Beyer et al. 2007).

Exact ``COUNT(DISTINCT id)`` at 100 TB needs the full id set on the
shuffle for every (source, bucket) cell and CANNOT cascade: the 1h tier
can't be built from 1m distinct counts.  A KMV sketch is a bounded
``k``-element summary per cell that (a) estimates the distinct count with
relative error ~1/sqrt(k-2) and (b) merges EXACTLY: the k smallest hashes
of a union are computable from the children's k smallest — so coarser
tiers derive from finer ones without re-reading raw data, the same
continuous-aggregate contract as the sum/min/max measures in
plans/rollup.py.

Everything is deterministic md5 arithmetic (no rand(), no JVM hash
seeds), so a sketch is bit-identical on any cluster AND reproducible in
DuckDB for the oracle gate — same trick as dedup/'s md5 hash families.

Plan shape (see PLANS.md): dedup is a groupBy(keys, h) with map-side
partial aggregation (the per-partition state is the partition's distinct
set, not the input rows); the per-key k-smallest filter is row_number
over (keys ORDER BY h) + filter, which Spark rewrites to
WindowGroupLimit — a per-partition top-k heap BEFORE the shuffle — so
at most k rows per key per map task hit the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: uniform on [0, 2^60), exactly representable in
# both BIGINT and double (< 2^53 matters only for the ESTIMATE, whose
# (k-1)*2^60/h_k arithmetic is pure double on both engines).
KMV_BITS = 60
KMV_SPACE = float(2**KMV_BITS)


def kmv_hash(col: Column, salt: str = "kmv") -> Column:
    """Deterministic 60-bit uniform hash of ``col`` — reproducible in any
    engine with md5: DuckDB ('0x' || substr(md5(x || '|kmv'), 1, 15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(f"|{salt}"))), 1, 15),
        16, 10,
    ).cast("long")


def _k_smallest(hashed: DataFrame, keys: list[str], k: int, out: str) -> DataFrame:
    """distinct → per-key k smallest → sorted array.  ``hashed`` has
    columns keys + __h."""
    d = hashed.distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list("__h")).alias(out))
    )


def kmv_sketch(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    k: int = 64,
    out: str = "kmv",
) -> DataFrame:
    """Per ``keys`` group: sorted array of the ``k`` smallest distinct
    60-bit hashes of ``id_col`` — a bounded, exactly-mergeable
    distinct-count summary.  len(out) < k ⇒ the group's distinct count is
    EXACT (= len); otherwise estimate with :func:`kmv_estimate`."""
    hashed = df.select(*keys, kmv_hash(F.col(id_col)).alias("__h"))
    return _k_smallest(hashed, keys, k, out)


def kmv_merge(
    df: DataFrame,
    keys: list[str],
    k: int = 64,
    col: str = "kmv",
) -> DataFrame:
    """Merge sketches up a tier (e.g. (source, 1m-bucket) → (source, 1h)):
    union the children's hash sets and keep the k smallest.  EXACT —
    merge(sketch(A), sketch(B)) == sketch(A ∪ B) element-for-element, so
    tier cascades never lose accuracy relative to sketching raw."""
    exploded = df.select(*keys, F.explode(col).alias("__h"))
    return _k_smallest(exploded, keys, k, col)


def kmv_estimate(col: Column, k: int) -> Column:
    """Distinct-count estimate from a KMV array: exact size when the
    sketch is not full, else the unbiased (k-1) / F(h_k) estimator with
    F(h) = h / 2^60 (Beyer et al. 2007)."""
    return (
        F.when(F.size(col) < k, F.size(col).cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.element_at(col, k))
    )
