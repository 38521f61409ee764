"""Session-timezone safety: the engine's time bucketing, resampling,
sessionization and as-of matching must produce IDENTICAL results under any
spark.sql.session.timeZone when the input is TIMESTAMP_NTZ — the north-rule
store runs on NTZ event time.  Kathmandu (+05:45) is the torture case: its
fractional offset shifts even HOUR buckets through a naive date_trunc."""

import contextlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators.align import asof_join
from pyg_timeseries_spark.operators.resample import resample, time_bucket_col
from pyg_timeseries_spark.operators.sessions import session_stats
from pyg_timeseries_spark.plans.rollup import bucket_col

ZONES = ["UTC", "America/New_York", "Asia/Kathmandu"]


@contextlib.contextmanager
def session_tz(spark, tz):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def _ntz(spark, n=400, seed=53):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "key": [f"k{i % 3}" for i in range(n)],
            "ts": pd.Timestamp("2024-03-09 20:00:00")  # spans a US DST jump
            + pd.to_timedelta(np.cumsum(rng.integers(60, 3600, n)), unit="s"),
            "v": rng.normal(10, 2, n),
        }
    )
    # build NTZ from STRINGS: a lazy cast(LTZ -> NTZ) would route through
    # the session timezone at each collection — exactly the hazard the
    # engine avoids by keeping event time NTZ end-to-end
    pdf["ts"] = pdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S")
    df = spark.createDataFrame(pdf)
    return df.withColumn("ts", F.to_timestamp_ntz("ts"))


def _rows(df):
    return sorted(map(str, df.collect()))


def test_bucket_and_resample_tz_invariant(spark):
    df = _ntz(spark)
    ref = None
    for tz in ZONES:
        with session_tz(spark, tz):
            got = _rows(
                df.select(
                    "key",
                    bucket_col("ts", "1h", df).alias("b1h"),
                    bucket_col("ts", "1d", df).alias("b1d"),
                    time_bucket_col(df, "ts", 300.0).alias("b5m"),
                )
            )
            agg = _rows(resample(df, 900.0).select("key", "bucket", "cnt"))
        if ref is None:
            ref = (got, agg)
        else:
            assert (got, agg) == ref, tz


def test_sessions_and_asof_tz_invariant(spark):
    df = _ntz(spark)
    right = (
        df.filter(F.second("ts") < 20)  # deterministic subset, NTZ-component
        .select("key", "ts", F.col("v").alias("px"))
    )
    ref = None
    for tz in ZONES:
        with session_tz(spark, tz):
            sess = _rows(session_stats(df, key="key", ts="ts", gap_s=1800.0))
            asof = _rows(
                asof_join(df, right, key="key", ts="ts", tolerance_s=7200.0)
            )
        if ref is None:
            ref = (sess, asof)
        else:
            assert (sess, asof) == ref, tz


def test_timestamp_bucket_anchoring_is_session_tz_free(spark):
    """For TIMESTAMP (instant) columns, time_bucket_col anchors on the UTC
    epoch via unix_micros — the bucket assignment must be identical under
    any session zone, including the fractional-offset torture case (a
    session-zone-interpreted epoch literal would shift 1h buckets by
    +05:45 under Kathmandu)."""
    pdf = pd.DataFrame(
        {
            "key": ["a"] * 6,
            "ts": pd.date_range("2024-03-10 00:10:00", periods=6, freq="37min"),
            "v": np.arange(6.0),
        }
    )
    df = spark.createDataFrame(pdf)  # pandas datetime64 -> TIMESTAMP
    assert df.schema["ts"].dataType.typeName() == "timestamp"

    def buckets(tz):
        # evaluate the bucketing UNDER tz; unix_micros renders the bucket
        # instant as a zone-free long so results compare across sessions
        with session_tz(spark, tz):
            return [
                r[0]
                for r in df.select(
                    F.unix_micros(time_bucket_col(df, "ts", 3600.0))
                ).collect()
            ]

    ref = buckets("UTC")
    for tz in ZONES[1:]:
        assert buckets(tz) == ref, tz
