"""Pairwise rolling stats (rolling_cor / rolling_beta / rolling_zscore) vs
pandas references under the joint-validity convention."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators.rolling_pair import (
    rolling_beta,
    rolling_cor,
    rolling_zscore,
)

N = 20


def _pair(n=1200, seed=31, nulls=True):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, n)
    y = 0.6 * x + rng.normal(0, 0.5, n)
    pdf = pd.DataFrame(
        {
            "key": [f"k{i % 3}" for i in range(n)],
            "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "x": x,
            "y": y,
        }
    )
    if nulls:
        pdf.loc[rng.random(n) < 0.15, "x"] = np.nan
        pdf.loc[rng.random(n) < 0.15, "y"] = np.nan
    return pdf


def _collect(df, out):
    got = df.toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    return got


def test_rolling_cor_matches_pandas(spark):
    pdf = _pair()
    got = _collect(rolling_cor(spark.createDataFrame(pdf), N), "rolling_cor")
    for k, g in got.groupby("key"):
        sub = pdf[pdf["key"] == k].dropna(subset=["x", "y"]).sort_values("ts")
        exp = sub["x"].rolling(N).corr(sub["y"])
        gv = g.dropna(subset=["x", "y"]).sort_values("ts")["rolling_cor"]
        assert np.allclose(
            gv.to_numpy(), exp.to_numpy(), atol=1e-9, equal_nan=True
        ), k
        # rows with either side null emit null
        nullrows = g[g["x"].isna() | g["y"].isna()]["rolling_cor"]
        assert nullrows.isna().all()


def test_rolling_beta_matches_pandas(spark):
    pdf = _pair()
    got = _collect(rolling_beta(spark.createDataFrame(pdf), N), "rolling_beta")
    for k, g in got.groupby("key"):
        sub = pdf[pdf["key"] == k].dropna(subset=["x", "y"]).sort_values("ts")
        cov = sub["x"].rolling(N).cov(sub["y"])
        var = sub["x"].rolling(N).var()
        exp = cov / var
        gv = g.dropna(subset=["x", "y"]).sort_values("ts")["rolling_beta"]
        assert np.allclose(
            gv.to_numpy(), exp.to_numpy(), atol=1e-9, equal_nan=True
        ), k


def test_rolling_zscore_matches_pandas(spark):
    pdf = _pair()[["key", "ts", "x"]].rename(columns={"x": "v"})
    got = _collect(rolling_zscore(spark.createDataFrame(pdf), N), "rolling_zscore")
    for k, g in got.groupby("key"):
        sub = pdf[pdf["key"] == k].dropna(subset=["v"]).sort_values("ts")
        exp = (sub["v"] - sub["v"].rolling(N).mean()) / sub["v"].rolling(N).std()
        gv = g.dropna(subset=["v"]).sort_values("ts")["rolling_zscore"]
        assert np.allclose(
            gv.to_numpy(), exp.to_numpy(), atol=1e-9, equal_nan=True
        ), k


def test_beta_recovers_slope(spark):
    pdf = _pair(n=3000, nulls=False)
    got = rolling_beta(spark.createDataFrame(pdf), 500)
    med = got.agg(F.expr("percentile_approx(rolling_beta, 0.5)")).first()[0]
    assert abs(med - 0.6) < 0.1


def test_expanding_cor_beta_match_pandas(spark):
    from pyg_timeseries_spark.operators.rolling_pair import (
        expanding_beta,
        expanding_cor,
    )

    pdf = _pair()
    for fn, out, ref in [
        (expanding_cor, "expanding_cor",
         lambda s: s["x"].expanding(3).corr(s["y"])),
        (expanding_beta, "expanding_beta",
         lambda s: s["x"].expanding(3).cov(s["y"]) / s["x"].expanding(3).var()),
    ]:
        got = _collect(fn(spark.createDataFrame(pdf), 3), out)
        for k, g in got.groupby("key"):
            sub = pdf[pdf["key"] == k].dropna(subset=["x", "y"]).sort_values("ts")
            exp = ref(sub)
            gv = g.dropna(subset=["x", "y"]).sort_values("ts")[out]
            assert np.allclose(
                gv.to_numpy(), exp.to_numpy(), atol=1e-9, equal_nan=True
            ), (out, k)


def test_rolling_cov_matches_pandas(spark):
    from pyg_timeseries_spark.operators.rolling_pair import rolling_cov

    pdf = _pair()
    got = _collect(rolling_cov(spark.createDataFrame(pdf), N), "rolling_cov")
    for k, g in got.groupby("key"):
        sub = pdf[pdf["key"] == k].dropna(subset=["x", "y"]).sort_values("ts")
        exp = sub["x"].rolling(N).cov(sub["y"])
        gv = g.dropna(subset=["x", "y"]).sort_values("ts")["rolling_cov"]
        assert np.allclose(gv.to_numpy(), exp.to_numpy(), atol=1e-9,
                           equal_nan=True), k


def test_ts_argmax_argmin(spark):
    import pandas as pd

    from pyg_timeseries_spark.operators.ts import ts_argmax, ts_argmin

    pdf = pd.DataFrame(
        {
            "key": ["a"] * 4 + ["b"] * 3,
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:01",
                 "2024-01-01 00:02", "2024-01-01 00:03",
                 "2024-01-02 00:00", "2024-01-02 00:01", "2024-01-02 00:02"]
            ),
            "v": [1.0, 5.0, 5.0, np.nan, -2.0, -2.0, 7.0],
        }
    )
    df = spark.createDataFrame(pdf)
    amax = {r["key"]: str(r["ts_argmax"]) for r in ts_argmax(df).collect()}
    amin = {r["key"]: str(r["ts_argmin"]) for r in ts_argmin(df).collect()}
    assert amax["a"] == "2024-01-01 00:02:00"  # tie -> latest
    assert amin["a"] == "2024-01-01 00:00:00"
    assert amax["b"] == "2024-01-02 00:02:00"
    assert amin["b"] == "2024-01-02 00:00:00"  # tie -> earliest


def test_expanding_cov_matches_pandas(spark):
    from pyg_timeseries_spark.operators.rolling_pair import expanding_cov

    pdf = _pair()
    got = _collect(expanding_cov(spark.createDataFrame(pdf), 3), "expanding_cov")
    for k, g in got.groupby("key"):
        sub = pdf[pdf["key"] == k].dropna(subset=["x", "y"]).sort_values("ts")
        exp = sub["x"].expanding(3).cov(sub["y"])
        gv = g.dropna(subset=["x", "y"]).sort_values("ts")["expanding_cov"]
        assert np.allclose(gv.to_numpy(), exp.to_numpy(), atol=1e-9,
                           equal_nan=True), k


def test_rolling_cov_rejects_n1(spark, series_df):
    import pytest as _pt

    from pyg_timeseries_spark.operators.rolling_pair import rolling_cov

    with _pt.raises(ValueError, match="n >= 2"):
        rolling_cov(series_df.withColumn("x", F.col("v")).withColumn("y", F.col("v")), 1)


def test_rolling_acf_matches_pandas(spark, series_pdf):
    """Engine lag-2 rolling ACF == pandas rolling corr of the valid-row
    shifted series (the reference's NaN-skip shift semantics)."""
    import numpy as np
    import pandas as pd

    from pyg_timeseries_spark.operators.rolling_pair import rolling_acf

    sdf = spark.createDataFrame(series_pdf).withColumn(
        "v", F.when(F.isnan("v"), F.lit(None)).otherwise(F.col("v"))
    )
    n, lag = 10, 2
    got = (
        rolling_acf(sdf, n, lag=lag, out="acf")
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    for k, g in series_pdf.groupby("key"):
        g = g.sort_values("ts")
        valid = g.dropna(subset=["v"]).copy()
        valid["vl"] = valid["v"].shift(lag)
        both = valid.dropna(subset=["vl"])
        exp = both["v"].rolling(n).corr(both["vl"])
        sub = got[got.key == k].set_index("ts")
        for ts, e in zip(both["ts"], exp):
            a = sub.loc[ts, "acf"]
            if pd.isna(e):
                assert pd.isna(a), (k, ts)
            else:
                assert a == pytest.approx(e, rel=1e-9, abs=1e-9), (k, ts)
