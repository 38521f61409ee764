"""Series cleaning: despike / winsorize against a TRAILING window.

The spike statistic deliberately excludes the current row (frame
``[-n, -1]`` over valid rows): a genuine spike would otherwise inflate its
own mean/std and mask itself.  Pure window expressions — one per-key
shuffle shared with the rest of the rolling family, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyg_timeseries_spark.functions.formulas import stdev_calc
from pyg_timeseries_spark.operators._core import KEY, TS, VAL, apply_on_valid, wspec


def _trailing_stats(n: int, key: str, ts: str, v: str):
    w = wspec(key, ts).rowsBetween(-n, -1)
    c = F.col(v)
    cnt = F.count(v).over(w)
    t1 = F.sum(c).over(w)
    t2 = F.sum(c * c).over(w)
    return cnt, t1 / cnt, stdev_calc(cnt.cast("double"), t1, t2)


def despike(
    df: DataFrame,
    n: int = 20,
    z: float = 5.0,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "despiked",
) -> DataFrame:
    """NULL out observations more than ``z`` trailing standard deviations
    from the trailing-``n`` mean; rows before n prior valid observations
    pass through unchanged (no history to judge against)."""
    cnt, mean, std = _trailing_stats(n, key, ts, v)
    c = F.col(v)
    # coalesce: a NULL std (degenerate window) must read "not a spike",
    # not propagate NULL through the boolean and erase the row
    spike = F.coalesce(
        (cnt >= n) & (std > 0) & (F.abs(c - mean) > F.lit(float(z)) * std),
        F.lit(False),
    )
    return apply_on_valid(df, out, F.when(~spike, c), v=v)


def winsorize(
    df: DataFrame,
    n: int = 20,
    z: float = 5.0,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "winsorized",
) -> DataFrame:
    """Clip observations to mean ± z·std of the trailing-``n`` window
    instead of dropping them."""
    cnt, mean, std = _trailing_stats(n, key, ts, v)
    c = F.col(v)
    lo, hi = mean - F.lit(float(z)) * std, mean + F.lit(float(z)) * std
    ready = F.coalesce((cnt >= n) & (std > 0), F.lit(False))
    clipped = F.when(c < lo, lo).when(c > hi, hi).otherwise(c)
    return apply_on_valid(df, out, F.when(ready, clipped).otherwise(c), v=v)
