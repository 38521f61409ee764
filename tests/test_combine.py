"""ewmcombine: single-factor and full-factor variance models."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators.combine import ewmcombine


@pytest.fixture(scope="module")
def signals(spark):
    rng = np.random.default_rng(21)
    t, m = 400, 4
    common = rng.normal(0, 1, t)
    frames = []
    for i in range(m):
        a = 0.6 * common + 0.8 * rng.normal(0, 1, t)  # rho ≈ 0.36, RMS-1
        frames.append(pd.DataFrame({
            "key": f"s{i}",
            "ts": pd.date_range("2024-01-01", periods=t, freq="1h"),
            "a": a,
            "w": 1.0,
        }))
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


def test_single_factor(signals):
    out = ewmcombine(signals, n=64).toPandas().sort_values("ts")
    # steady state: rho estimate near the planted 0.36, output near RMS-1
    tail = out.iloc[100:]
    assert abs(tail["erho"].mean() - 0.36) < 0.25
    assert abs(np.sqrt((tail["data"] ** 2).mean()) - 1.0) < 0.35
    # x = sum of signals (w=1); w1=4, w2=4, wij=12
    assert (tail["w1"] == 4.0).all()
    assert (tail["wij"] == 12.0).all()


def test_full_factor(signals):
    out = ewmcombine(signals, n=64, full_corr=64).toPandas().sort_values("ts")
    tail = out.iloc[100:]
    assert tail["variance"].notna().all()
    assert abs(np.sqrt((tail["data"] ** 2).mean()) - 1.0) < 0.35
    # full-factor variance should be in the same ballpark as single-factor
    single = ewmcombine(signals, n=64).toPandas().sort_values("ts").iloc[100:]
    ratio = (tail["variance"].to_numpy() / single["variance"].to_numpy())
    assert np.nanmedian(ratio) == pytest.approx(1.0, abs=0.5)


def test_weights_zero_before_first_valid(spark):
    rng = np.random.default_rng(5)
    t = 120
    ts = pd.date_range("2024-01-01", periods=t, freq="1h")
    a1 = rng.normal(0, 1, t)
    a2 = rng.normal(0, 1, t)
    a2[:60] = np.nan  # signal 2 starts late
    pdf = pd.concat([
        pd.DataFrame({"key": "s1", "ts": ts, "a": a1, "w": 1.0}),
        pd.DataFrame({"key": "s2", "ts": ts, "a": a2, "w": 1.0}),
    ], ignore_index=True)
    df = spark.createDataFrame(pdf)
    df = df.withColumn("a", F.when(F.isnan("a"), None).otherwise(F.col("a")))
    out = ewmcombine(df, n=32).toPandas().sort_values("ts")
    # before s2 starts, effective W1 is 1 (late signal contributes no weight)
    assert (out.iloc[:60]["w1"] == 1.0).all()
    assert (out.iloc[61:]["w1"] == 2.0).all()
