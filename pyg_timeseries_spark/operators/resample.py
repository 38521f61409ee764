"""Arbitrary-width time bucketing (the TimescaleDB ``time_bucket`` analog)
and resampled aggregates / OHLC bars.

The fixed tier cascade (plans/rollup.py) covers 1m/1h/1d; these operators
bucket to ANY width in integer-microsecond arithmetic — no double division
near bucket boundaries (the bucket floor is ``us - pmod(us, width_us)`` on
longs) and no session-timezone routing: NTZ buckets anchor on the wall
clock (component arithmetic), TIMESTAMP buckets anchor on the UTC instant
(``unix_micros``); the two coincide in a UTC session.

Plan shape: bucketing is a pure row expression; every aggregate below is a
single partial+final hash aggregate on (keys..., bucket) — the same
one-shuffle shape as the tier cascade, so it scales identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH = "1970-01-01 00:00:00"


def time_bucket_col(df: DataFrame, ts: str, width_s: float,
                    origin: str = _EPOCH) -> Column:
    """Bucket-start timestamp of ``ts`` for ``width_s``-second buckets
    anchored at ``origin`` — exact integer-microsecond arithmetic, same
    type as the input column.  NTZ columns use component arithmetic
    (functions/timeutil.py): Spark's timestamp_diff would route NTZ
    through the session timezone, shifting wall times inside DST gaps;
    the bucket start comes back via timestamp_add on the ROW's own
    timestamp, which is TZ-free for NTZ."""
    from pyg_timeseries_spark.functions.timeutil import py_epoch_us, ts_us

    rel = ts_us(df, ts) - F.lit(py_epoch_us(origin))
    w_us = int(round(width_s * 1_000_000))
    delta = -F.pmod(rel, F.lit(w_us))  # ≤ 0: distance back to bucket start
    return F.timestamp_add("MICROSECOND", delta, F.col(ts))


def resample(
    df: DataFrame,
    width_s: float,
    key: str = "key",
    ts: str = "ts",
    v: str = "v",
    origin: str = _EPOCH,
) -> DataFrame:
    """Downsample to (key, bucket) rows carrying cnt/sum/mean/min/max of
    ``v`` plus first/last timestamps — one hash aggregate."""
    c = F.col(v)
    return (
        df.groupBy(
            F.col(key).alias("key"),
            time_bucket_col(df, ts, width_s, origin).alias("bucket"),
        )
        .agg(
            F.count(c).alias("cnt"),
            F.sum(c).alias("sum_v"),
            F.avg(c).alias("mean_v"),
            F.min(c).alias("min_v"),
            F.max(c).alias("max_v"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
        )
    )


def ohlc_resample(
    df: DataFrame,
    width_s: float,
    key: str = "key",
    ts: str = "ts",
    v: str = "v",
    origin: str = _EPOCH,
) -> DataFrame:
    """OHLC bars at any width.  Open/close are deterministic under
    duplicate timestamps: min/max over (ts, v) structs break ties on the
    value, so the result never depends on partitioning order."""
    c = F.col(v)
    pair = F.struct(F.col(ts).alias("t"), c.alias("x"))
    return (
        df.groupBy(
            F.col(key).alias("key"),
            time_bucket_col(df, ts, width_s, origin).alias("bucket"),
        )
        .agg(
            F.min(pair)["x"].alias("open"),
            F.max(c).alias("high"),
            F.min(c).alias("low"),
            F.max(pair)["x"].alias("close"),
            F.count(c).alias("cnt"),
        )
    )


def twap_resample(
    df: DataFrame,
    width_s: float,
    key: str = "key",
    ts: str = "ts",
    v: str = "v",
) -> DataFrame:
    """Time-weighted average per (key, bucket) — the TimescaleDB
    ``time_weight('locf', ...)`` analog, within-bucket variant: each
    observation's value holds from its own timestamp until the next
    observation in the same bucket (the last one holds until bucket
    end), and the bucket's TWAP is Σ(v·dt)/Σ(dt) in exact integer-µs
    weights.  A bucket whose single observation sits exactly on the
    bucket end gets dt 0 and a NULL twap (no holding time).  Unlike
    ``resample``'s plain mean this is robust to irregular sampling — a
    burst of readings no longer dominates the bucket.

    Plan: one per-key window (lead) + one partial+final hash aggregate —
    same single-exchange class as resample.  Valid rows only (NULL v
    rows neither hold value nor clip the previous observation)."""
    from pyspark.sql import Window

    from pyg_timeseries_spark.functions.timeutil import py_epoch_us, ts_us

    w_us = int(round(width_s * 1_000_000))
    valid = df.filter(F.col(v).isNotNull())
    us = ts_us(valid, ts)
    rel = us - F.lit(py_epoch_us(_EPOCH))
    bucket_end_us = us - F.pmod(rel, F.lit(w_us)) + F.lit(w_us)
    p = valid.select(
        F.col(key).alias(key),
        time_bucket_col(valid, ts, width_s).alias("bucket"),
        F.col(v).alias(v),
        us.alias("__us"),
        bucket_end_us.alias("__end_us"),
    ).withColumn(
        "__dt",
        F.least(
            # v tiebreaks duplicate timestamps deterministically
            F.coalesce(F.lead("__us").over(
                Window.partitionBy(key).orderBy("__us", v)
            ), F.col("__end_us")),
            F.col("__end_us"),
        ) - F.col("__us"),
    )
    return p.groupBy(key, "bucket").agg(
        F.count(v).alias("cnt"),
        (F.sum(F.col(v) * F.col("__dt"))
         / F.when(F.sum("__dt") > 0, F.sum("__dt"))).alias("twap"),
        F.sum("__dt").alias("held_us"),
    )


def realized_vol(
    df: DataFrame,
    width_s: float,
    key: str = "key",
    ts: str = "ts",
    v: str = "v",
    origin: str = _EPOCH,
) -> DataFrame:
    """Per-(key, bucket) realized-volatility decomposition from the valid
    series' one-step differences r_t = x_t - x_{t-1} (NaN-skip lag like
    the shift family): ``rv`` = Σ r² (realized variance, Andersen &
    Bollerslev 1998), ``bpv`` = (π/2) Σ |r_t||r_{t-1}| (bipower
    variation, Barndorff-Nielsen & Shephard 2004 — jump-robust), and
    ``jump`` = max(rv − bpv, 0), the jump component.  Differences are
    taken over the whole per-key series and attributed to the bucket of
    the CURRENT observation, so the first return of a bucket spans the
    boundary (the standard convention; a bucket with no prior obs
    contributes nothing).

    Shape: one lag Window pass + one partial+final hash aggregate — one
    Exchange on key, group keys (key, bucket) extend the window's
    partitioning."""
    from pyg_timeseries_spark.operators._core import wspec
    import math

    c = F.col(v)
    w = wspec(key, ts)
    valid = df.filter(c.isNotNull())
    r = (c - F.lag(c, 1).over(w)).alias("__r")
    rl = (F.lag(c, 1).over(w) - F.lag(c, 2).over(w)).alias("__rl")
    stepped = valid.select(
        key, F.col(ts),
        time_bucket_col(valid, ts, width_s, origin).alias("bucket"),
        r, rl,
    )
    rr, rrl = F.col("__r"), F.col("__rl")
    return (
        stepped.groupBy(key, "bucket")
        .agg(
            F.count("__r").alias("n_ret"),
            F.coalesce(F.sum(rr * rr), F.lit(0.0)).alias("rv"),
            F.coalesce(
                F.sum(F.abs(rr) * F.abs(rrl)) * F.lit(math.pi / 2.0),
                F.lit(0.0),
            ).alias("bpv"),
        )
        .withColumn("jump", F.greatest(F.col("rv") - F.col("bpv"), F.lit(0.0)))
    )
