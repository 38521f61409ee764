"""Embedding-column profiling — per-dimension distribution statistics
over an ``array<float>`` column.

The screen an embedding pipeline runs before indexing/training: dead
dimensions (zero variance), scale drift between batches (per-dim mean /
std vs a reference profile feeds functions/drift.py PSI), and NULL /
non-finite contamination.

Scale shape: ``posexplode`` widens the corpus by the dimension count,
but the groupBy(dim) aggregate does map-side partial combine — the
shuffle carries (dim × map tasks) partial-moment rows, NOT corpus × dim
element rows, and dim (64-4096) is tiny relative to any corpus.  All
JVM-side; no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_stats(corpus: DataFrame, vec: str = "embedding") -> DataFrame:
    """Per dimension (0-based): n valid elements, n_bad (NULL / NaN /
    ±Inf), mean, std (sample), min, max.  Rows whose vector is NULL are
    skipped entirely (they contribute to no dimension); a NaN/Inf
    element contributes only to its dimension's ``n_bad``."""
    el = corpus.filter(F.col(vec).isNotNull()).select(
        F.posexplode(F.col(vec).cast("array<double>")).alias("dim", "x")
    )
    bad = F.col("x").isNull() | F.isnan("x") | (F.abs("x") == float("inf"))
    good = F.when(~bad, F.col("x"))
    return (
        el.groupBy("dim")
        .agg(
            F.count(good).alias("n"),
            F.sum(bad.cast("long")).alias("n_bad"),
            F.avg(good).alias("mean"),
            F.stddev_samp(good).alias("std"),
            F.min(good).alias("min"),
            F.max(good).alias("max"),
        )
    )


def embedding_quantize(
    corpus: DataFrame,
    vec: str = "embedding",
    out_q: str = "qvec",
    out_scale: str = "scale",
    out_mse: str = "recon_mse",
) -> DataFrame:
    """Symmetric per-row int8 quantization of the embedding column — the
    4× storage/bandwidth cut an ANN index applies before sharding
    (Jégou et al.'s scalar-quantization baseline): scale = max|x|/127,
    q_i = floor(x_i/scale + 0.5) ∈ [−127, 127] (explicit round-half-up,
    NOT the engine round() whose half-even ties differ between engines),
    plus the per-row reconstruction MSE so a pipeline can gate on
    quantization loss.  All-zero vectors get scale 0 and an all-zero
    qvec.  Map-only: pure array expressions, no shuffle, no Python."""
    x = F.col(vec).cast("array<double>")
    mx = F.array_max(F.transform(x, F.abs))
    scale = mx / F.lit(127.0)
    q = F.when(
        mx > 0,
        F.transform(
            x, lambda e: F.floor(e / scale + F.lit(0.5)).cast("int")
        ),
    ).otherwise(F.transform(x, lambda e: F.lit(0)))
    recon_sq = F.zip_with(
        x, F.col(out_q),
        lambda e, qq: (e - qq.cast("double") * scale)
        * (e - qq.cast("double") * scale),
    )
    mse = F.aggregate(recon_sq, F.lit(0.0), lambda a, e: a + e) / F.size(x)
    return (
        corpus.filter(F.col(vec).isNotNull())
        .withColumn(out_scale, scale)
        .withColumn(out_q, q)
        .withColumn(out_mse, mse)
    )
