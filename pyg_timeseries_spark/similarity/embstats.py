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
    qvec.  Non-finite elements degrade per-row, not loudly: a NaN/Inf
    makes max|x| non-finite, the ``mx > 0`` gate then fails, and the row
    comes back with an all-zero qvec and NaN scale/mse — screen inputs
    with :func:`embedding_stats` (``n_bad``) first if contamination must
    be rejected.  Map-only: pure array expressions, no shuffle, no
    Python."""
    x = F.col(vec).cast("array<double>")
    mx = F.array_max(F.transform(x, F.abs))
    # Everything below is LET-BOUND (textops/analysis.py:_let): ``scale``
    # closes over ``mx = array_max(transform(x, abs))``, and Catalyst
    # re-evaluates closed-over subexpressions PER ELEMENT inside
    # higher-order-function lambdas — the naive rendition re-derived the
    # O(dim) max inside both the quantize and the reconstruction lambdas,
    # making the whole row O(dim²) (measured ~10x on the 64-dim bench
    # corpus; at 1024-4096 dims it is fatal).  Binding (x, mx, scale, q)
    # as lambda variables evaluates each exactly once per row; the struct
    # materializes once and the field extraction below cannot re-inline it.
    from pyg_timeseries_spark.textops.analysis import _let

    def _with_x(xv):
        def _with_mx(mx):
            def _with_scale(scale):
                q = F.when(
                    mx > 0,
                    F.transform(
                        xv, lambda e: F.floor(e / scale + F.lit(0.5)).cast("int")
                    ),
                ).otherwise(F.transform(xv, lambda e: F.lit(0)))

                def _with_q(qv):
                    recon_sq = F.zip_with(
                        xv, qv,
                        lambda e, qq: (e - qq.cast("double") * scale)
                        * (e - qq.cast("double") * scale),
                    )
                    mse = (
                        F.aggregate(recon_sq, F.lit(0.0), lambda a, e: a + e)
                        / F.size(xv)
                    )
                    return F.struct(
                        scale.alias("scale"), qv.alias("q"), mse.alias("mse")
                    )

                return _let(q, _with_q)

            return _let(mx / F.lit(127.0), _with_scale)

        return _let(F.array_max(F.transform(xv, F.abs)), _with_mx)

    st = _let(x, _with_x)
    return (
        corpus.filter(F.col(vec).isNotNull())
        .withColumn("__eq", st)
        .withColumn(out_scale, F.col("__eq.scale"))
        .withColumn(out_q, F.col("__eq.q"))
        .withColumn(out_mse, F.col("__eq.mse"))
        .drop("__eq")
    )
