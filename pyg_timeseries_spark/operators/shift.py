"""Shift / diff / ratio — NaN-skipping lags as Catalyst window expressions.

The reference's shift skips NaNs (the lag is the previous *valid* value —
/root/reference/src/pyg_timeseries/_rolling.py:377-407, 947-1005), unlike
pandas shift.  Long-format rendition: lag over the null-filtered frame, null
rows unioned back (operators/_core.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators._core import KEY, TS, VAL, apply_on_valid, wspec


def shift(
    df: DataFrame,
    n: int = 1,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "shift",
) -> DataFrame:
    """n-lag (n<0 = lead) over valid rows. Reference _rolling.py:947-1005."""
    w = wspec(key, ts)
    expr = F.lag(v, n).over(w) if n >= 0 else F.lead(v, -n).over(w)
    return apply_on_valid(df, out, expr, v=v)


def diff(
    df: DataFrame,
    n: int = 1,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "diff",
) -> DataFrame:
    """n-period difference over valid rows (diff(a,0) == zeros-with-NaNs,
    reference _rolling.py:818-870, 847-848)."""
    if n == 0:
        return df.withColumn(out, F.col(v) - F.col(v))
    w = wspec(key, ts)
    lagv = F.lag(v, n).over(w) if n > 0 else F.lead(v, -n).over(w)
    return apply_on_valid(df, out, F.col(v) - lagv, v=v)


def ratio(
    df: DataFrame,
    n: int = 1,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "ratio",
) -> DataFrame:
    """n-period ratio; NULL when the lagged value is 0 (reference
    _rolling.py:349-368, 1007-1044)."""
    w = wspec(key, ts)
    lagv = F.lag(v, n).over(w) if n > 0 else F.lead(v, -n).over(w)
    expr = F.when(lagv != 0.0, F.col(v) / lagv)
    return apply_on_valid(df, out, expr, v=v)
