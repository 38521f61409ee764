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
