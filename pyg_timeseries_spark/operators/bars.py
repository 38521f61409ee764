"""Bar / OHLC operators — pure column arithmetic + window dedupe.

Reference: /root/reference/src/pyg_timeseries/_bar.py (ohlc_r2 :71-186,
bar_r2 :189-246, bar_daily_to_eod :10-68) and _ewm_psd.py:9-41
(overlapping_returns).  The r2 estimators follow Yang-Zhang
(atmif.com/papers/range.pdf) without drift correction, exactly as the
reference's formula block (_bar.py:155-178).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators._core import KEY, TS, VAL

LN2 = math.log(2.0)


def ohlc_r2(
    df: DataFrame,
    o1: str = "open", h1: str = "high", l1: str = "low", c1: str = "close",
    c0: str = "prev_close",
    model: str = "yz",
    alpha: float | None = None,
    out: str = "r2",
) -> DataFrame:
    """Point-in-time R² variance estimate from an OHLC bar (one row per
    bar; `c0` = previous close, e.g. via shift).  Models: cc, p (Parkinson),
    rs (Rogers-Satchell), gk (Garman-Klass), yz (Yang-Zhang, default), o, c.
    """
    O = F.col(o1) - F.col(c0)
    C = F.col(c1) - F.col(o1)
    cc = F.col(c1) - F.col(c0)
    u = F.col(h1) - F.col(o1)
    d = F.col(l1) - F.col(o1)
    hl = F.col(h1) - F.col(l1)

    V_cc = cc * cc
    V_rs = u * (u - C) + d * (d - C)
    a = alpha or 1.34
    k = (a - 1) / (a + 1)
    V_o = O * O
    V_c = C * C
    V_p = (u - d) * (u - d) / (4 * LN2)
    V_gk = V_o - 0.383 * V_c + 1.364 * V_p + 0.019 * V_rs
    V_yz = V_o + k * V_c + (1 - k) * V_rs
    # nan fallbacks (reference _bar.py:174-176): yz → gk → cc; bad high-low → cc
    V_yz = F.coalesce(V_yz, V_gk, V_cc)
    V_yz = F.when(hl <= 0, V_cc).otherwise(V_yz)
    res = {
        "yz": V_yz, "gk": V_gk, "p": V_p, "c": V_c, "cc": V_cc,
        "rs": V_rs, "o": V_o,
    }[model.lower()]
    return df.withColumn(out, res)


def bar_r2(df: DataFrame, key: str = KEY, ts: str = TS, model: str = "yz",
           alpha: float | None = None, out: str = "r2",
           o: str = "open", h: str = "high", l: str = "low",  # noqa: E741
           c: str = "close") -> DataFrame:
    """ohlc_r2 over a keyed bar series — derives prev_close via lag."""
    w = Window.partitionBy(key).orderBy(ts)
    with_prev = df.withColumn("_c0", F.lag(c).over(w))
    return ohlc_r2(with_prev, o1=o, h1=h, l1=l, c1=c, c0="_c0",
                   model=model, alpha=alpha, out=out).drop("_c0")


def bar_daily_to_eod(
    df: DataFrame,
    key: str = KEY,
    ts: str = TS,
    o: str | None = "open",
    v: str | None = "volume",
) -> DataFrame:
    """Collapse intraday "day-so-far" bars to end-of-day rows: a day ends
    where the next row's open changes or its volume drops (reference
    _bar.py:10-68; calendar trade-date mapping simplified to the row's UTC
    date).  This is the downsample primitive dedupe-to-last-per-bucket."""
    w = Window.partitionBy(key).orderBy(ts)
    is_last = F.lead(ts).over(w).isNull()
    masks = []
    if o:
        masks.append((F.col(o) - F.lead(o).over(w) != 0) & ~is_last)
    if v:
        masks.append(F.col(v) - F.lead(v).over(w) > 0)
    if not masks:
        day = F.to_date(ts)
        masks.append(F.lead(day, 1).over(w) != day)
    boundary = masks[0]
    for m in masks[1:]:
        boundary = boundary | m
    kept = df.withColumn("_keep", boundary | is_last).filter(F.col("_keep")).drop("_keep")
    # collapse repeated dates: keep the last row per (key, date)
    day = F.to_date(F.col(ts)).alias("_d")
    wd = Window.partitionBy(key, F.to_date(F.col(ts))).orderBy(F.col(ts).desc())
    return (
        kept.withColumn("_rn", F.row_number().over(wd))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def overlapping_returns(
    df: DataFrame,
    overlapping: int = 1,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "overlapping",
) -> DataFrame:
    """Calendar-anchored k-row overlapping sums: sum of the last k rows'
    values treating NULL as 0, NULL when the window holds no observation
    (reference _ewm_psd.py:9-41).  Pure sliding-window arithmetic; the
    incremental 'tail' state is the window-op tail-row state
    (operators/window_state.py)."""
    if overlapping <= 1:
        return df.withColumn(out, F.col(v))
    w = (
        Window.partitionBy(key).orderBy(ts)
        .rowsBetween(-(overlapping - 1), Window.currentRow)
    )
    total = F.sum(F.coalesce(F.col(v), F.lit(0.0))).over(w)
    cnt = F.count(v).over(w)
    return df.withColumn(out, F.when(cnt > 0, total))
