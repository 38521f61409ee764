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


def hampel(
    df: DataFrame,
    n: int = 20,
    z: float = 3.0,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "hampel",
) -> DataFrame:
    """Hampel filter against the TRAILING window: replace the current
    observation with the trailing-``n`` window MEDIAN when it sits more
    than ``z`` robust sigmas (1.4826 * MAD) from that median.  The robust
    analog of :func:`winsorize` — mean/std despiking breaks when the
    window itself is spike-contaminated (one spike inflates the std that
    is supposed to catch the next one); median/MAD has a ~50% breakdown
    point.  Hampel (1974); same exclude-current frame ``[-n, -1]`` as
    despike/winsorize so a spike cannot mask itself, rows before ``n``
    prior valid observations pass through unchanged, and a degenerate
    window (MAD = 0) never fires.

    Appends ``{out}`` (filtered series) and ``{out}_flag`` (boolean,
    True where replaced).  Pure window + higher-order array expressions,
    one per-key Exchange shared with the rolling family."""
    from pyg_timeseries_spark.operators.rolling import sorted_interp_median

    c = F.col(v)
    w = wspec(key, ts).rowsBetween(-n, -1)
    med_c, arr_c, cnt_c = f"__{out}_med", f"__{out}_arr", f"__{out}_cnt"
    valid = (
        df.filter(c.isNotNull())
        .withColumn(med_c, F.expr(f"percentile({v}, 0.5)").over(w))
        .withColumn(arr_c, F.collect_list(c).over(w))
        .withColumn(cnt_c, F.count(v).over(w))
    )
    med = F.col(med_c)
    mad = sorted_interp_median(
        F.transform(F.col(arr_c), lambda x: F.abs(x - med))
    )
    sigma = F.lit(1.4826) * mad
    spike = F.coalesce(
        (F.col(cnt_c) >= n) & (sigma > 0)
        & (F.abs(c - med) > F.lit(float(z)) * sigma),
        F.lit(False),
    )
    valid = (
        valid
        .withColumn(out, F.when(spike, med).otherwise(c))
        .withColumn(f"{out}_flag", spike)
        .drop(med_c, arr_c, cnt_c)
    )
    nulls = (
        df.filter(c.isNull())
        .withColumn(out, F.lit(None).cast("double"))
        .withColumn(f"{out}_flag", F.lit(None).cast("boolean"))
    )
    return valid.unionByName(nulls)


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
