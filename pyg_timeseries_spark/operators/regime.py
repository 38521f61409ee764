"""Regime / change detection: CUSUM shift statistics and drawdown.

CUSUM (Page 1954, "Continuous inspection schemes", Biometrika 41) is
normally written as a sequential recurrence,

    s+_t = max(0, s+_{t-1} + (x_t - target - k))       (upward shifts)
    s-_t = max(0, s-_{t-1} - (x_t - target) - k)       (downward shifts)

which looks like it needs a per-key Python kernel.  It does not: the
max(0, ·) fold has the closed form

    s+_t = S_t - min(0, min_{j<=t} S_j),   S_t = cumsum(x - target - k)

(the reset-at-zero walk equals the walk minus its running minimum
floored at the origin), so both sides are pure window expressions —
one cumulative sum + one cumulative min over the same per-key ordered
window.  Catalyst shares the single Exchange with the rest of the
rolling family and the whole operator stays in WholeStageCodegen; at
100 TB this is the same cost as a cumsum, with none of the
Python-boundary or per-key-state machinery a literal recurrence would
drag in.  The reference engine has no changepoint family; this extends
its expanding ops (cumsum, _expanding.py) with the standard public
method.

Drawdown is the expanding-max composition pyg users build by hand from
expanding_max + ratio: dd_t = v_t / max_{j<=t} v_j - 1 (<= 0), with the
running peak emitted alongside.  NaN rows follow the engine-wide skip
convention (contribute nothing, emit NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators._core import KEY, TS, VAL, w_unbounded


def cusum(
    df: DataFrame,
    target: float = 0.0,
    k: float = 0.0,
    h: float | None = None,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "cusum",
) -> DataFrame:
    """Two-sided CUSUM statistics per key: appends ``{out}_pos`` (s+),
    ``{out}_neg`` (s-), and — when an alarm threshold ``h`` is given —
    a boolean ``{out}_alarm`` (s+ > h or s- > h).

    ``target`` is the in-control mean, ``k`` the slack (usually half the
    shift magnitude to detect, in the same units as v).  Statistics reset
    to 0 implicitly through the running-minimum identity; both sides ride
    ONE per-key window (single shuffle, fully codegen'd)."""
    w = w_unbounded(key, ts)
    c = F.col(v)
    # windows can't nest — stage the cumulative sums, then take their
    # running minimum in a second projection (same Exchange, same stage)
    valid = (
        df.filter(c.isNotNull())
        .withColumn("__sp", F.sum(c - F.lit(float(target)) - F.lit(float(k))).over(w))
        .withColumn("__sn", F.sum(F.lit(float(target)) - c - F.lit(float(k))).over(w))
        .withColumn(
            f"{out}_pos",
            F.col("__sp") - F.least(F.min("__sp").over(w), F.lit(0.0)),
        )
        .withColumn(
            f"{out}_neg",
            F.col("__sn") - F.least(F.min("__sn").over(w), F.lit(0.0)),
        )
        .drop("__sp", "__sn")
    )
    nulls = df.filter(c.isNull())
    for col in (f"{out}_pos", f"{out}_neg"):
        nulls = nulls.withColumn(col, F.lit(None).cast("double"))
    res = valid.unionByName(nulls)
    if h is not None:
        res = res.withColumn(
            f"{out}_alarm",
            F.when(
                F.col(f"{out}_pos").isNotNull(),
                (F.col(f"{out}_pos") > float(h))
                | (F.col(f"{out}_neg") > float(h)),
            ),
        )
    return res


def drawdown(
    df: DataFrame,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "drawdown",
) -> DataFrame:
    """Appends ``{out}`` = v / running-peak - 1 (0 at new highs, negative
    under water) and ``{out}_peak`` = the expanding max itself.  Peaks <= 0
    yield NULL drawdown (ratio undefined) rather than a sign-flipped
    number."""
    w = w_unbounded(key, ts)
    peak = F.max(F.col(v)).over(w)
    dd = F.when(peak > 0, F.col(v) / peak - 1.0)
    valid = df.filter(F.col(v).isNotNull()).withColumn(
        f"{out}_peak", peak
    ).withColumn(out, dd)
    nulls = (
        df.filter(F.col(v).isNull())
        .withColumn(f"{out}_peak", F.lit(None).cast("double"))
        .withColumn(out, F.lit(None).cast("double"))
    )
    return valid.unionByName(nulls)


def max_drawdown(
    df: DataFrame,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
) -> DataFrame:
    """Per-key summary: (key, max_dd, peak_at_max, trough_at_max) — the
    deepest drawdown and the peak/trough pair realizing it (earliest
    trough on ties).  One window pass + one tiny per-key aggregate."""
    dd = drawdown(df, key, ts, v).filter(F.col("drawdown").isNotNull())
    best = F.min(
        F.struct(
            F.col("drawdown").alias("dd"),
            F.col(ts).alias("t"),
            F.col("drawdown_peak").alias("pk"),
            F.col(v).alias("tr"),
        )
    )
    return dd.groupBy(key).agg(
        best.getField("dd").alias("max_dd"),
        best.getField("pk").alias("peak_at_max"),
        best.getField("tr").alias("trough_at_max"),
    )


def ts_peaks(df: DataFrame, w: int = 2, key: str = "key", ts: str = "ts",
             v: str = "v") -> DataFrame:
    """Local-maximum detection over the valid series: a row is a peak
    when its value strictly exceeds every one of the ``w`` valid
    neighbours on BOTH sides (plateaus never peak — deterministic), with
    ``prominence`` = v − max(highest neighbour on either side).  Rows
    without w neighbours on each side (series edges) never qualify.
    The scipy.signal.find_peaks neighbourhood rendition as two trailing/
    leading max windows — one Exchange, all JVM-side.

    Emits only the peak rows: (key, ts, v, prominence)."""
    from pyg_timeseries_spark.operators._core import wspec

    c = F.col(v)
    valid = df.filter(c.isNotNull())
    wp = wspec(key, ts).rowsBetween(-w, -1)
    wn = wspec(key, ts).rowsBetween(1, w)
    maxp = F.max(v).over(wp)
    maxn = F.max(v).over(wn)
    cntp = F.count(v).over(wp)
    cntn = F.count(v).over(wn)
    flagged = valid.select(
        key, ts, v,
        ((cntp == w) & (cntn == w) & (c > maxp) & (c > maxn)).alias("__pk"),
        (c - F.greatest(maxp, maxn)).alias("prominence"),
    )
    return flagged.filter(F.col("__pk")).drop("__pk")
