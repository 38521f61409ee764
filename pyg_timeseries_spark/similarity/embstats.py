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
