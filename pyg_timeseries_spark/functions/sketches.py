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


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): bounded frequency
# summaries per (source, bucket).  Exact per-token counts at 100 TB need a
# (keys, token) shuffle whose width is the vocabulary — and the coarse
# tiers would need the full per-token table from the fine tier to cascade.
# A CMS is a fixed depth×width counter grid that (a) answers point
# frequency queries with overestimate ≤ eN/width (one-sided), and
# (b) merges EXACTLY by element-wise sum — integer addition is
# order-free, so merge(cms(A), cms(B)) == cms(A ∪ B) bit-for-bit and the
# tier cascade never drifts from sketching raw.
#
# All hash positions are the same deterministic md5 arithmetic as KMV
# (row j salts with "|cms{j}"), so sketches are identical on any cluster
# and replayable in DuckDB for the oracle gate.
#
# Plan shape: one groupBy(keys, item) with map-side partial aggregation
# (bounded by vocabulary per partition), a depth-way explode of
# (position, count) increments — depth rows per DISTINCT (keys, item),
# not per input row — then groupBy(keys, idx) sums and a final
# map_from_entries scatter into the dense grid.  No UDFs anywhere.
# ---------------------------------------------------------------------------


def cms_position(col: Column, row: int, width: int, salt: str = "cms") -> Column:
    """Deterministic column position of ``col`` in CMS row ``row``:
    md5(x || '|cms{row}') → 60-bit int → mod width.  DuckDB replay:
    ('0x' || substr(md5(x || '|cms{row}'), 1, 15))::BIGINT % width."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(col.cast("string"), F.lit(f"|{salt}{row}"))), 1, 15
        ),
        16, 10,
    ).cast("long")
    return h % F.lit(width)


def _dense_grid(entries: DataFrame, keys: list[str], size: int, out: str) -> DataFrame:
    """(keys, __idx, __cnt) sparse rows → one dense long[size] per key
    group, zeros where no entry.  map_from_entries + sequence scatter —
    pure codegen, no UDF."""
    return (
        entries.groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__idx"), F.col("__cnt")))
            ).alias("__m")
        )
        .select(
            *keys,
            F.transform(
                F.sequence(F.lit(0), F.lit(size - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("__m"), i), F.lit(0).cast("long")
                ),
            ).alias(out),
        )
    )


def cms_sketch(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
    out: str = "cms",
) -> DataFrame:
    """Per ``keys`` group: a depth×width count-min grid over ``item_col``
    occurrences (or ``weight_col`` sums), flattened row-major into one
    long[depth*width] array.  Frequency of x ≈ min_j grid[j*width + pos_j(x)]
    (:func:`cms_query`); merge tiers with :func:`cms_merge`."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    counts = df.groupBy(*keys, item_col).agg(F.sum(w).cast("long").alias("__c"))
    incs = counts.select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.struct(
                        (
                            F.lit(j * width)
                            + cms_position(F.col(item_col), j, width)
                        ).cast("int").alias("__idx"),
                        F.col("__c").alias("__cnt"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__e"),
    ).select(*keys, "__e.__idx", "__e.__cnt")
    summed = incs.groupBy(*keys, "__idx").agg(F.sum("__cnt").alias("__cnt"))
    return _dense_grid(summed, keys, depth * width, out)


def cms_merge(
    df: DataFrame,
    keys: list[str],
    depth: int = 4,
    width: int = 64,
    col: str = "cms",
) -> DataFrame:
    """Merge child sketches up a tier by element-wise sum.  EXACT:
    addition commutes, so any merge tree equals sketching the raw union.
    ``depth``/``width`` must match the child sketches (the grid size is a
    static property of the sketch family, never probed from the data)."""
    exploded = df.select(
        *keys, F.posexplode(col).alias("__idx", "__cnt")
    ).filter(F.col("__cnt") != 0)
    summed = exploded.groupBy(*keys, "__idx").agg(F.sum("__cnt").alias("__cnt"))
    merged = _dense_grid(summed, keys, depth * width, col)
    # a key group whose merged grid is entirely zero has no surviving
    # exploded rows — join the distinct keys back so it yields a zero grid
    # instead of silently disappearing.  NULL-SAFE equality: a NULL key
    # component must match its own merged row, not fall through to the
    # zero grid.
    zero = F.array_repeat(F.lit(0).cast("long"), depth * width)
    left = df.select(*keys).distinct().alias("__l")
    right = merged.alias("__r")
    cond = None
    for k in keys:
        c = F.col(f"__l.{k}").eqNullSafe(F.col(f"__r.{k}"))
        cond = c if cond is None else (cond & c)
    return left.join(right, cond, "left").select(
        *[F.col(f"__l.{k}").alias(k) for k in keys],
        F.coalesce(F.col(f"__r.{col}"), zero).alias(col),
    )


def cms_query(col: Column, item: Column, depth: int, width: int) -> Column:
    """Point-frequency estimate of ``item`` from a CMS array: the min
    counter across the depth rows (one-sided overestimate)."""
    return F.least(
        *[
            F.element_at(
                col, (F.lit(j * width) + cms_position(item, j, width) + 1).cast("int")
            )
            for j in range(depth)
        ]
    )


# ---------------------------------------------------------------------------
# Bottom-k uniform sample (Cohen & Kaplan 2007 "bottom-k sketches"):
# the quantile analog of KMV.  Keeping the k items with the SMALLEST
# deterministic hash of their id is a uniform random sample of the
# distinct ids that merges EXACTLY — bottom-k of a union is the bottom-k
# of the union of the children's bottom-k sets — so per-bucket value
# distributions (doc lengths, token counts) get percentile estimates
# that cascade 1m→1h→1d without re-reading raw, with sampling error
# ~1/sqrt(k) on each quantile.  Same md5 determinism / DuckDB
# replayability as KMV; same WindowGroupLimit top-k plan shape.
# ---------------------------------------------------------------------------


def _k_smallest_pairs(
    pairs: DataFrame, keys: list[str], k: int, out: str
) -> DataFrame:
    """pairs has columns keys + __h + __v; keep each group's k smallest
    by hash as a sorted array<struct<h,v>>."""
    d = pairs.distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*keys)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("__h").alias("h"), F.col("__v").alias("v"))
                )
            ).alias(out)
        )
    )


def bottomk_sample(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    value_col: str,
    k: int = 64,
    out: str = "sample",
) -> DataFrame:
    """Per ``keys`` group: the ``k`` distinct ids with the smallest
    60-bit hash, each carrying its ``value_col`` — a bounded, exactly-
    mergeable uniform sample.  n < k ⇒ the sample IS the population and
    quantiles are exact."""
    pairs = df.select(
        *keys,
        kmv_hash(F.col(id_col), salt="bk").alias("__h"),
        F.col(value_col).cast("double").alias("__v"),
    )
    return _k_smallest_pairs(pairs, keys, k, out)


def bottomk_merge(
    df: DataFrame, keys: list[str], k: int = 64, col: str = "sample"
) -> DataFrame:
    """Merge samples up a tier: union children, keep the k smallest by
    hash.  EXACT — element-for-element equal to sampling the raw union."""
    exploded = df.select(*keys, F.explode(col).alias("__e")).select(
        *keys, F.col("__e.h").alias("__h"), F.col("__e.v").alias("__v")
    )
    return _k_smallest_pairs(exploded, keys, k, col)


def bottomk_quantile(col: Column, q: float) -> Column:
    """Nearest-rank quantile of the sampled values: value at index
    ceil(q*n) (1-based) of the value-sorted sample.  Deterministic and
    replayable in SQL; exact when the group had fewer than k ids."""
    vals = F.array_sort(F.transform(col, lambda s: s["v"]))
    idx = F.greatest(
        F.lit(1), F.ceil(F.lit(float(q)) * F.size(vals)).cast("int")
    )
    return F.element_at(vals, idx)
