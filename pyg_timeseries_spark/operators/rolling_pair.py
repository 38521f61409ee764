"""Pairwise rolling statistics over the last n jointly-valid observations:
correlation, OLS beta, and the single-series rolling z-score.

Extension beyond the reference surface (its pairwise family is exponentially
weighted — operators/pairwise.py); the rolling renditions use the same
Σx/Σy/Σxy sliding-sum algebra inside Catalyst window frames, so they are
O(1)-per-row incremental and fully codegen'd — no kernel, no shuffle beyond
the per-key window partitioning shared with the rest of the rolling family.

Validity follows the pairwise convention (kernels/pairwise_numpy.py): a row
counts only when BOTH columns are non-null; invalid rows emit NULL and do
not consume window slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators._core import KEY, TS, VAL, w_rows


def _pair_apply(df, x, y, out, expr_builder, n, key, ts):
    both = F.col(x).isNotNull() & F.col(y).isNotNull()
    valid = df.filter(both)
    w = w_rows(n, key, ts)
    cnt = F.count(x).over(w)
    valid = valid.withColumn(out, F.when(cnt >= n, expr_builder(w)))
    nulls = df.filter(F.col(x).isNull() | F.col(y).isNull()).withColumn(
        out, F.lit(None).cast("double")
    )
    return valid.unionByName(nulls)


def rolling_cor(
    df: DataFrame,
    n: int,
    key: str = KEY,
    ts: str = TS,
    x: str = "x",
    y: str = "y",
    out: str = "rolling_cor",
) -> DataFrame:
    """Pearson correlation over the last n jointly-valid rows:
    (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²))."""

    def build(w):
        sx, sy = F.sum(x).over(w), F.sum(y).over(w)
        sxx = F.sum(F.col(x) * F.col(x)).over(w)
        syy = F.sum(F.col(y) * F.col(y)).over(w)
        sxy = F.sum(F.col(x) * F.col(y)).over(w)
        num = n * sxy - sx * sy
        den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        return F.when(den > 0, num / den)

    return _pair_apply(df, x, y, out, build, n, key, ts)


def rolling_beta(
    df: DataFrame,
    n: int,
    key: str = KEY,
    ts: str = TS,
    x: str = "x",
    y: str = "y",
    out: str = "rolling_beta",
) -> DataFrame:
    """OLS slope of y on x over the last n jointly-valid rows:
    (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)."""

    def build(w):
        sx, sy = F.sum(x).over(w), F.sum(y).over(w)
        sxx = F.sum(F.col(x) * F.col(x)).over(w)
        sxy = F.sum(F.col(x) * F.col(y)).over(w)
        den = n * sxx - sx * sx
        return F.when(den != 0, (n * sxy - sx * sy) / den)

    return _pair_apply(df, x, y, out, build, n, key, ts)


def rolling_zscore(
    df: DataFrame,
    n: int,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "rolling_zscore",
) -> DataFrame:
    """(v − rolling_mean) / rolling_std over the last n valid observations
    (unbiased std, the reference's sum algebra)."""
    from pyg_timeseries_spark.operators._core import apply_on_valid
    from pyg_timeseries_spark.functions.formulas import stdev_calc

    w = w_rows(n, key, ts)
    cnt = F.count(v).over(w)
    c = F.col(v)
    t1, t2 = F.sum(c).over(w), F.sum(c * c).over(w)
    std = stdev_calc(F.lit(n), t1, t2)
    mean = t1 / n
    expr = F.when((cnt >= n) & (std > 0), (c - mean) / std)
    return apply_on_valid(df, out, expr, v=v)


def expanding_cor(
    df: DataFrame,
    min_periods: int = 3,
    key: str = KEY,
    ts: str = TS,
    x: str = "x",
    y: str = "y",
    out: str = "expanding_cor",
) -> DataFrame:
    """Pearson correlation over ALL jointly-valid history (gated until
    ``min_periods``); the running-sum algebra uses the live count, so the
    expression stays one Window pass."""
    from pyg_timeseries_spark.operators._core import w_unbounded

    both = F.col(x).isNotNull() & F.col(y).isNotNull()
    valid = df.filter(both)
    w = w_unbounded(key, ts)
    cnt = F.count(x).over(w).cast("double")
    sx, sy = F.sum(x).over(w), F.sum(y).over(w)
    sxx = F.sum(F.col(x) * F.col(x)).over(w)
    syy = F.sum(F.col(y) * F.col(y)).over(w)
    sxy = F.sum(F.col(x) * F.col(y)).over(w)
    num = cnt * sxy - sx * sy
    den = F.sqrt((cnt * sxx - sx * sx) * (cnt * syy - sy * sy))
    expr = F.when((cnt >= min_periods) & (den > 0), num / den)
    valid = valid.withColumn(out, expr)
    nulls = df.filter(F.col(x).isNull() | F.col(y).isNull()).withColumn(
        out, F.lit(None).cast("double")
    )
    return valid.unionByName(nulls)


def expanding_beta(
    df: DataFrame,
    min_periods: int = 3,
    key: str = KEY,
    ts: str = TS,
    x: str = "x",
    y: str = "y",
    out: str = "expanding_beta",
) -> DataFrame:
    """OLS slope of y on x over all jointly-valid history."""
    from pyg_timeseries_spark.operators._core import w_unbounded

    both = F.col(x).isNotNull() & F.col(y).isNotNull()
    valid = df.filter(both)
    w = w_unbounded(key, ts)
    cnt = F.count(x).over(w).cast("double")
    sx, sy = F.sum(x).over(w), F.sum(y).over(w)
    sxx = F.sum(F.col(x) * F.col(x)).over(w)
    sxy = F.sum(F.col(x) * F.col(y)).over(w)
    den = cnt * sxx - sx * sx
    expr = F.when((cnt >= min_periods) & (den != 0), (cnt * sxy - sx * sy) / den)
    valid = valid.withColumn(out, expr)
    nulls = df.filter(F.col(x).isNull() | F.col(y).isNull()).withColumn(
        out, F.lit(None).cast("double")
    )
    return valid.unionByName(nulls)


def rolling_cov(
    df: DataFrame,
    n: int,
    key: str = KEY,
    ts: str = TS,
    x: str = "x",
    y: str = "y",
    out: str = "rolling_cov",
) -> DataFrame:
    """Unbiased sample covariance over the last n jointly-valid rows:
    (Σxy − ΣxΣy/n) / (n−1)."""
    if n < 2:
        raise ValueError(f"rolling_cov needs n >= 2 (got n={n}): the "
                         "(n-1) denominator is degenerate for a 1-row window")

    def build(w):
        sx, sy = F.sum(x).over(w), F.sum(y).over(w)
        sxy = F.sum(F.col(x) * F.col(y)).over(w)
        return (sxy - sx * sy / n) / (n - 1)

    return _pair_apply(df, x, y, out, build, n, key, ts)


def expanding_cov(
    df: DataFrame,
    min_periods: int = 3,
    key: str = KEY,
    ts: str = TS,
    x: str = "x",
    y: str = "y",
    out: str = "expanding_cov",
) -> DataFrame:
    """Unbiased sample covariance over all jointly-valid history."""
    from pyg_timeseries_spark.operators._core import w_unbounded

    both = F.col(x).isNotNull() & F.col(y).isNotNull()
    valid = df.filter(both)
    w = w_unbounded(key, ts)
    cnt = F.count(x).over(w).cast("double")
    sx, sy = F.sum(x).over(w), F.sum(y).over(w)
    sxy = F.sum(F.col(x) * F.col(y)).over(w)
    expr = F.when(cnt >= min_periods, (sxy - sx * sy / cnt) / (cnt - 1))
    valid = valid.withColumn(out, expr)
    nulls = df.filter(F.col(x).isNull() | F.col(y).isNull()).withColumn(
        out, F.lit(None).cast("double")
    )
    return valid.unionByName(nulls)


def rolling_acf(
    df: DataFrame,
    n: int,
    lag: int = 1,
    key: str = KEY,
    ts: str = TS,
    v: str = "v",
    out: str = "rolling_acf",
    lag_out: str | None = None,
) -> DataFrame:
    """Rolling autocorrelation: Pearson correlation of (v_t, v_{t-lag})
    over the last ``n`` jointly-valid pairs per key.  The lagged partner is
    the ``lag``-th previous VALID observation (the engine's shift
    semantics, reference _rolling.py:947-1005), so NaN gaps don't smear
    the alignment; the pair correlation then reuses rolling_cor's
    single-Window sliding-sum shape."""
    from pyg_timeseries_spark.operators.shift import shift

    lcol = lag_out or "__acf_lag"
    lagged = shift(df, lag, key=key, ts=ts, v=v, out=lcol)
    r = rolling_cor(lagged, n, key=key, ts=ts, x=v, y=lcol, out=out)
    return r if lag_out else r.drop(lcol)
