"""Distribution-drift monitoring: Population Stability Index between a
reference and a current period over FIXED bin edges.

PSI = Σ_b (p_cur[b] − p_ref[b]) · ln(p_cur[b] / p_ref[b]) with Laplace
smoothing (+0.5 per bin) so empty bins stay finite and the statistic is
deterministic and engine-replayable.  Conventional read: <0.1 stable,
0.1-0.25 moderate shift, >0.25 major shift.

Plan shape: binning is a row expression; one hash aggregate on
(key, bin) with conditional partial sums for the two periods, then a tiny
(key) aggregate — the corpus never shuffles more than (key, bin) rows.
Fixed explicit edges (not per-key quantiles) keep the monitor exact,
comparable across runs, and free of a quantile pre-pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def value_bin(v: Column, lo: float, hi: float, bins: int) -> Column:
    """0-based bin of ``v`` over [lo, hi) with equal widths; values outside
    clamp to the edge bins (standard PSI practice)."""
    width = (hi - lo) / bins
    raw = F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")
    return F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))


def psi_drift(
    df: DataFrame,
    ref: Column,
    cur: Column,
    key: str = "key",
    v: str = "v",
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """Per ``key``: PSI of ``v``'s distribution in the ``cur`` period vs
    the ``ref`` period (boolean Columns), plus the period row counts.
    Rows in neither period are ignored; null values are ignored."""
    c = F.col(v)
    d = df.filter(c.isNotNull() & (ref | cur)).select(
        F.col(key).alias("key"),
        value_bin(c, lo, hi, bins).alias("__bin"),
        ref.cast("int").alias("__r"),
        cur.cast("int").alias("__c"),
    )
    per_bin = d.groupBy("key", "__bin").agg(
        F.sum("__r").alias("nr"), F.sum("__c").alias("nc")
    )
    totals = per_bin.groupBy("key").agg(
        F.sum("nr").alias("n_ref"), F.sum("nc").alias("n_cur"),
        F.count(F.lit(1)).alias("bins_seen"),
    )
    j = per_bin.join(totals, "key")
    # Laplace: every one of the `bins` cells gets +smooth in both periods.
    # Bins with no rows at all for a key share one closed-form term
    # (nr = nc = 0), added per key as (bins - bins_seen) · t0 — no need to
    # materialize empty cells.
    def _p(cnt, total):
        return (cnt + F.lit(smooth)) / (total + F.lit(smooth * bins))

    term = (
        _p(F.col("nc"), F.col("n_cur")) - _p(F.col("nr"), F.col("n_ref"))
    ) * F.log(_p(F.col("nc"), F.col("n_cur")) / _p(F.col("nr"), F.col("n_ref")))
    present = j.groupBy("key").agg(
        F.sum(term).alias("psi_present"),
        F.first("n_ref").alias("n_ref"),
        F.first("n_cur").alias("n_cur"),
        F.first("bins_seen").alias("bins_seen"),
    )
    zero = F.lit(0).cast("long")
    t0 = (
        _p(zero, F.col("n_cur")) - _p(zero, F.col("n_ref"))
    ) * F.log(_p(zero, F.col("n_cur")) / _p(zero, F.col("n_ref")))
    return present.select(
        "key",
        (
            F.col("psi_present") + (F.lit(bins) - F.col("bins_seen")) * t0
        ).alias("psi"),
        "n_ref", "n_cur",
    )


def ks_drift(
    df: DataFrame,
    ref: Column,
    cur: Column,
    key: str = "key",
    v: str = "v",
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per ``key``:
    sup_x |F_ref(x) − F_cur(x)|, attained at sample points, computed in a
    single value-ordered RANGE-frame window pass (the range frame folds
    duplicate values into one ECDF step, which makes ties exact).
    Complements :func:`psi_drift`: no bin edges to choose, scale-free."""
    c = F.col(v)
    d = df.filter(c.isNotNull() & (ref | cur)).select(
        F.col(key).alias("key"),
        c.cast("double").alias("__v"),
        ref.cast("long").alias("__r"),
        cur.cast("long").alias("__c"),
    )
    from pyspark.sql import Window

    wv = (
        Window.partitionBy("key")
        .orderBy("__v")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wk = Window.partitionBy("key")
    cum_r = F.sum("__r").over(wv)
    cum_c = F.sum("__c").over(wv)
    n_r = F.sum("__r").over(wk)
    n_c = F.sum("__c").over(wk)
    gap = F.abs(
        cum_r.cast("double") / n_r - cum_c.cast("double") / n_c
    )
    return (
        d.withColumn("__gap", gap)
        .withColumn("__nr", n_r)
        .withColumn("__nc", n_c)
        .groupBy("key")
        .agg(
            F.max("__gap").alias("ks"),
            F.first("__nr").alias("n_ref"),
            F.first("__nc").alias("n_cur"),
        )
    )


def psi_timeline(
    df: DataFrame,
    width_s: float = 86400.0,
    key: str = "key",
    ts: str = "ts",
    v: str = "v",
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """The rolling drift MONITOR: PSI of each ``width_s``-second time
    bucket's value distribution against the PREVIOUS bucket, per key —
    one row per (key, bucket) that has a predecessor, so an alerting job
    reads a ready-made drift series instead of re-running
    :func:`psi_drift` once per period pair.  Same fixed-edge Laplace PSI
    formula, so the two agree exactly on any single pair; empty buckets
    break the chain explicitly (no histogram → no pair — comparing
    across a gap would silently dilute the signal; gap_stats finds the
    gaps).

    Plan shape: ONE (key, bucket, bin) hash aggregate over the corpus
    (map-side combined), histograms densify to a bins-length array per
    (key, bucket) — at most keys × buckets slim rows — and consecutive
    buckets pair with a single equi-join on (key, bucket − width); the
    PSI folds JVM-side over the zipped arrays."""
    from pyg_timeseries_spark.operators.resample import time_bucket_col

    c = F.col(v)
    d = df.filter(c.isNotNull()).select(
        F.col(key).alias("key"),
        time_bucket_col(df, ts, width_s).alias("bucket"),
        value_bin(c, lo, hi, bins).alias("__bin"),
    )
    per_bin = d.groupBy("key", "bucket", "__bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    # densify: hist[b] = count for b in 0..bins-1 (bins is small; the
    # O(bins²) filter-per-cell stays a trivial row expression)
    pairs = F.collect_list(F.struct(F.col("__bin").alias("b"),
                                    F.col("n").alias("n")))
    # try_element_at: the filter is empty for bins this bucket never hit,
    # where plain element_at(…, 1) throws under Spark 4 ANSI (the
    # textops/lm.py:36-38 lesson)
    hist_expr = F.transform(
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda b: F.coalesce(
            F.try_element_at(
                F.filter(F.col("__p"), lambda e: e["b"] == b), F.lit(1)
            )["n"],
            F.lit(0).cast("long"),
        ),
    )
    h = (
        per_bin.groupBy("key", "bucket").agg(pairs.alias("__p"))
        .select(
            "key", "bucket", hist_expr.alias("hist"),
        )
        .withColumn(
            "nt",
            F.aggregate("hist", F.lit(0).cast("long"), lambda a, x: a + x),
        )
    )
    w_us = int(round(width_s * 1_000_000))
    cur, prev = h.alias("cur"), h.alias("prev")
    j = cur.join(
        prev,
        (F.col("cur.key") == F.col("prev.key"))
        & (F.col("cur.bucket")
           == F.timestamp_add("MICROSECOND", F.lit(w_us), F.col("prev.bucket"))),
    )

    def _p(cnt, total):
        return (cnt.cast("double") + F.lit(smooth)) / (
            total.cast("double") + F.lit(smooth * bins)
        )

    term = F.zip_with(
        F.col("cur.hist"), F.col("prev.hist"),
        lambda nc, nr: (
            _p(nc, F.col("cur.nt")) - _p(nr, F.col("prev.nt"))
        ) * F.log(_p(nc, F.col("cur.nt")) / _p(nr, F.col("prev.nt"))),
    )
    return j.select(
        F.col("cur.key").alias("key"),
        F.col("cur.bucket").alias("bucket"),
        F.aggregate(term, F.lit(0.0), lambda a, x: a + x).alias("psi"),
        F.col("prev.nt").alias("n_ref"),
        F.col("cur.nt").alias("n_cur"),
    )
