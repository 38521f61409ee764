"""Calendar seasonality: periodic profiles and deseasonalization.

The classic "seasonal naive" decomposition over a calendar period
(Hyndman & Athanasopoulos, *Forecasting: Principles and Practice* §3.4,
"classical decomposition" with a periodic seasonal component): average
the series per calendar phase (hour-of-day, day-of-week, ...), call
that the seasonal profile, and subtract it from the series to get the
deseasonalized residual.

Scale shape: the profile aggregate's output is tiny — |keys| × period
rows (period <= 168) — so it broadcast-joins back onto the corpus; the
full series shuffles ONCE for the groupBy and never again.  Phase
extraction is calendar-component arithmetic on TIMESTAMP_NTZ (never
through the session timezone — functions/timeutil.py's DST rule).

Phase conventions (documented because engines disagree):
  hour_of_day     0..23
  minute_of_hour  0..59
  day_of_week     0..6, 0 = Monday (Spark ``weekday``; DuckDB isodow-1)
  hour_of_week    0..167, 0 = Monday 00h
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators._core import KEY, TS, VAL

PHASES = ("hour_of_day", "minute_of_hour", "day_of_week", "hour_of_week")


def phase_col(ts: str, unit: str) -> Column:
    """Calendar phase of ``ts`` as an int column (conventions above)."""
    c = F.col(ts)
    if unit == "hour_of_day":
        return F.hour(c)
    if unit == "minute_of_hour":
        return F.minute(c)
    if unit == "day_of_week":
        return F.weekday(c)
    if unit == "hour_of_week":
        return F.weekday(c) * 24 + F.hour(c)
    raise ValueError(f"unit must be one of {PHASES}, got {unit!r}")


def seasonal_profile(
    df: DataFrame,
    unit: str = "hour_of_day",
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
) -> DataFrame:
    """(key, phase, phase_mean, phase_n) per calendar phase — the periodic
    profile.  NULL values are skipped (mean/count over valid rows only)."""
    return (
        df.groupBy(key, phase_col(ts, unit).alias("phase"))
        .agg(
            F.mean(v).alias("phase_mean"),
            F.count(v).alias("phase_n"),
        )
    )


def deseasonalize(
    df: DataFrame,
    unit: str = "hour_of_day",
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "deseasonalized",
) -> DataFrame:
    """Appends ``{out}`` = v - phase_mean(key, phase(ts)) and the
    ``phase_mean`` used.  The profile is computed from the SAME frame
    (in-sample decomposition) and broadcast back — the corpus shuffles
    once, for the profile aggregate."""
    prof = seasonal_profile(df, unit, key, ts, v)
    joined = df.withColumn("__phase", phase_col(ts, unit)).join(
        F.broadcast(prof.withColumnRenamed("phase", "__phase")),
        on=[key, "__phase"],
        how="left",
    )
    return (
        joined.withColumn(out, F.col(v) - F.col("phase_mean"))
        .drop("__phase", "phase_n")
    )
