"""Arbitrary-width time buckets + resampled aggregates / OHLC bars vs a
pandas reference, including sub-second widths, NTZ/LTZ type agreement, and
the deterministic OHLC tie-break."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators.resample import (
    ohlc_resample,
    resample,
    time_bucket_col,
)


def _series(n=3000, seed=23):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    ts = base + pd.to_timedelta(
        np.cumsum(rng.integers(1, 40_000_000, n)), unit="us"
    )
    return pd.DataFrame(
        {
            "key": [f"k{i % 4}" for i in range(n)],
            "ts": ts,
            "v": rng.normal(100, 5, n),
        }
    )


@pytest.mark.parametrize("width_s", [300.0, 90.0, 0.25])
def test_time_bucket_matches_pandas_floor(spark, width_s):
    pdf = _series(800)
    df = spark.createDataFrame(pdf)
    got = df.select(
        "ts", time_bucket_col(df, "ts", width_s).alias("b")
    ).toPandas()
    w_us = int(round(width_s * 1_000_000))
    exp = pdf["ts"].astype("int64") // 1000  # ns -> us
    exp = pd.to_datetime((exp - exp % w_us) * 1000)
    got = got.sort_values("ts").reset_index(drop=True)
    exp = exp.sort_values().reset_index(drop=True)
    assert (got["b"] == exp).all()


def test_resample_matches_pandas(spark):
    pdf = _series()
    df = spark.createDataFrame(pdf)
    got = (
        resample(df, 300.0)
        .toPandas()
        .sort_values(["key", "bucket"])
        .reset_index(drop=True)
    )
    exp = (
        pdf.set_index("ts")
        .groupby("key")["v"]
        .resample("300s")
        .agg(["count", "sum", "mean", "min", "max"])
        .reset_index()
    )
    exp = exp[exp["count"] > 0].sort_values(["key", "ts"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["key"] == exp["key"]).all()
    assert (got["bucket"] == exp["ts"]).all()
    assert (got["cnt"] == exp["count"]).all()
    for a, b in [("sum_v", "sum"), ("mean_v", "mean"), ("min_v", "min"), ("max_v", "max")]:
        assert np.allclose(got[a], exp[b], rtol=0, atol=1e-9), a


def test_ohlc_matches_pandas(spark):
    pdf = _series()
    df = spark.createDataFrame(pdf)
    got = (
        ohlc_resample(df, 300.0)
        .toPandas()
        .sort_values(["key", "bucket"])
        .reset_index(drop=True)
    )
    exp = (
        pdf.set_index("ts")
        .groupby("key")["v"]
        .resample("300s")
        .ohlc()
        .dropna()
        .reset_index()
    )
    exp = exp.sort_values(["key", "ts"]).reset_index(drop=True)
    assert len(got) == len(exp)
    for a in ("open", "high", "low", "close"):
        assert np.allclose(got[a], exp[a], rtol=0, atol=0), a


def test_ohlc_duplicate_ts_deterministic(spark):
    """Duplicate timestamps: open takes the SMALLEST v at the earliest ts,
    close the LARGEST v at the latest ts — partitioning-order-free."""
    pdf = pd.DataFrame(
        {
            "key": ["a"] * 4,
            "ts": pd.to_datetime(["2024-01-01 00:00:01"] * 2 + ["2024-01-01 00:00:02"] * 2),
            "v": [5.0, 3.0, 8.0, 9.0],
        }
    )
    for parts in (1, 4):
        df = spark.createDataFrame(pdf).repartition(parts)
        r = ohlc_resample(df, 60.0).first()
        assert (r["open"], r["high"], r["low"], r["close"]) == (3.0, 9.0, 3.0, 9.0)


def test_bucket_type_preserved(spark):
    pdf = _series(50)
    df = spark.createDataFrame(pdf)
    ntz = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    b_ltz = df.select(time_bucket_col(df, "ts", 300.0).alias("b"))
    b_ntz = ntz.select(time_bucket_col(ntz, "ts", 300.0).alias("b"))
    assert dict(b_ltz.dtypes)["b"] == "timestamp"
    assert dict(b_ntz.dtypes)["b"] == "timestamp_ntz"
    got_l = sorted(str(r["b"]) for r in b_ltz.collect())
    got_n = sorted(str(r["b"]) for r in b_ntz.collect())
    assert got_l == got_n  # UTC session: same wall-clock buckets


def test_resample_single_exchange(spark):
    pdf = _series(200)
    df = spark.createDataFrame(pdf)
    plan = resample(df, 300.0)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_twap_weights_by_holding_time(spark):
    """One bucket, two observations: v=10 held 4 minutes, v=20 held 1
    minute => twap 12.0 (a plain mean would say 15)."""
    import pandas as pd

    from pyg_timeseries_spark.operators.resample import twap_resample

    pdf = pd.DataFrame(
        {
            "key": ["a", "a"],
            "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:04:00"]),
            "v": [10.0, 20.0],
        }
    )
    out = twap_resample(spark.createDataFrame(pdf), 300.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cnt"] == 2 and r["held_us"] == 300_000_000
    assert abs(r["twap"] - 12.0) < 1e-12


def test_twap_constant_series_is_constant(spark, series_df):
    from pyg_timeseries_spark.operators.resample import twap_resample
    from pyspark.sql import functions as F

    const = series_df.withColumn("v", F.lit(7.5))
    out = twap_resample(const, 600.0)
    vals = [r["twap"] for r in out.collect()]
    assert vals and all(abs(x - 7.5) < 1e-12 for x in vals)
