"""Expanding / cumulative operators — unbounded-preceding windows over valid
rows (SURVEY.md §2.4; reference /root/reference/src/pyg_timeseries/
_expanding.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyg_timeseries_spark.functions.formulas import skew_calc, stdev_calc
from pyg_timeseries_spark.operators._core import (
    KEY, TS, VAL, apply_on_valid, w_unbounded,
)


def _expanding(df, key, ts, v, out, make_expr):
    w = w_unbounded(key, ts)
    return apply_on_valid(df, out, make_expr(w), v=v)


def cumsum(df: DataFrame, key: str = KEY, ts: str = TS, v: str = VAL,
           out: str = "cumsum") -> DataFrame:
    """NaN-skipping running sum (reference _expanding.py:40-51, 343-412)."""
    return _expanding(df, key, ts, v, out, lambda w: F.sum(v).over(w))


def cumprod(df: DataFrame, key: str = KEY, ts: str = TS, v: str = VAL,
            out: str = "cumprod") -> DataFrame:
    """Running product (reference _expanding.py:27-38, 121-199).

    exp(Σ log|v|) with a running sign flip — exact for the magnitudes up to
    float rounding, handles negatives; NULL from the first zero onward is
    avoided by emitting exact 0.0 once a zero enters the product.
    """
    c = F.col(v)

    def make(w):
        n_zero = F.sum((c == 0).cast("int")).over(w)
        n_neg = F.sum((c < 0).cast("int")).over(w)
        log_mag = F.sum(F.log(F.abs(F.nullif(c, F.lit(0.0))))).over(w)
        sign = F.when(n_neg % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
        return F.when(n_zero > 0, F.lit(0.0)).otherwise(sign * F.exp(log_mag))

    return _expanding(df, key, ts, v, out, make)


def expanding_mean(df: DataFrame, key: str = KEY, ts: str = TS, v: str = VAL,
                   out: str = "expanding_mean") -> DataFrame:
    """Reference _expanding.py:53-65, 205-272."""
    return _expanding(df, key, ts, v, out, lambda w: F.avg(v).over(w))


def expanding_rms(df: DataFrame, key: str = KEY, ts: str = TS, v: str = VAL,
                  out: str = "expanding_rms") -> DataFrame:
    """Reference _expanding.py:67-79, 274-341."""
    c = F.col(v)
    return _expanding(df, key, ts, v, out,
                      lambda w: F.sqrt(F.avg(c * c).over(w)))


def expanding_std(df: DataFrame, key: str = KEY, ts: str = TS, v: str = VAL,
                  out: str = "expanding_std") -> DataFrame:
    """Unbiased expanding std via stdev_calculation (_math.py:16-21);
    reference _expanding.py:81-94, 414-481."""
    c = F.col(v)

    def make(w):
        t0 = F.count(v).over(w).cast("double")
        return stdev_calc(t0, F.sum(c).over(w), F.sum(c * c).over(w))

    return _expanding(df, key, ts, v, out, make)


def expanding_skew(df: DataFrame, key: str = KEY, ts: str = TS, v: str = VAL,
                   bias: bool = False, out: str = "expanding_skew") -> DataFrame:
    """Reference _expanding.py:96-110, 483-524 + skew_calculation."""
    c = F.col(v)

    def make(w):
        t0 = F.count(v).over(w).cast("double")
        return skew_calc(
            t0, F.sum(c).over(w), F.sum(c * c).over(w),
            F.sum(c * c * c).over(w), bias=bias,
        )

    return _expanding(df, key, ts, v, out, make)


def expanding_min(df: DataFrame, key: str = KEY, ts: str = TS, v: str = VAL,
                  out: str = "expanding_min") -> DataFrame:
    """Reference _min.py:79-177."""
    return _expanding(df, key, ts, v, out, lambda w: F.min(v).over(w))


def expanding_max(df: DataFrame, key: str = KEY, ts: str = TS, v: str = VAL,
                  out: str = "expanding_max") -> DataFrame:
    """Reference _max.py (mirror)."""
    return _expanding(df, key, ts, v, out, lambda w: F.max(v).over(w))


def expanding_median(df: DataFrame, key: str = KEY, ts: str = TS, v: str = VAL,
                     out: str = "expanding_median") -> DataFrame:
    """Needs full history — explicitly not state-aware in the reference
    (_median.py:81-133, note at :87)."""
    return _expanding(df, key, ts, v, out,
                      lambda w: F.expr(f"percentile({v}, 0.5)").over(w))


def expanding_rank(df: DataFrame, key: str = KEY, ts: str = TS, v: str = VAL,
                   out: str = "expanding_rank") -> DataFrame:
    """Rank of the current value in full history so far, scaled to [-1, 1]
    (reference _rank.py:67-98): (#less - #greater) / (#seen - 1)."""
    c = F.col(v)

    def make(w):
        arr = F.collect_list(c).over(w)
        n_less = F.size(F.filter(arr, lambda x: x < c))
        n_greater = F.size(F.filter(arr, lambda x: x > c))
        denom = F.size(arr) - F.lit(1)
        return F.when(
            denom > 0, (n_less - n_greater).cast("double") / denom.cast("double")
        ).otherwise(F.lit(0.0))

    return _expanding(df, key, ts, v, out, make)
