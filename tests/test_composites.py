"""Composite DAGs, recurrence kernels, window-state resume, xrank."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.kernels import recurrence_numpy as RK
from pyg_timeseries_spark.operators.composite import ewmacd_, ewmvol, ou_factor
from pyg_timeseries_spark.operators.ewm import ewma, ewmrms
from pyg_timeseries_spark.operators.recurrence import buffer, buffer_, zmooth, zmooth_
from pyg_timeseries_spark.operators.rolling import rolling_mean
from pyg_timeseries_spark.operators.shift import diff
from pyg_timeseries_spark.operators.window_state import (
    make_stateful, resume_cumsum, expanding_state, tail_state,
)
from pyg_timeseries_spark.operators.xrank import xrank, xrank_kernel, xrank_simple


def _sorted(df):
    return df.toPandas().sort_values(["key", "ts"]).reset_index(drop=True)


# ---- window-state resume ----------------------------------------------------

def test_rolling_mean_tail_state_resume(spark, series_df):
    rolling_mean_ = make_stateful(rolling_mean, state_n=9)
    cut = F.lit("2024-01-01 02:00:00").cast("timestamp")
    head = series_df.filter(F.col("ts") < cut)
    tail = series_df.filter(F.col("ts") >= cut)
    full = _sorted(rolling_mean(series_df, 10))
    _, st = rolling_mean_(head, 10)
    resumed, _ = rolling_mean_(tail, 10, state_df=st)
    r = _sorted(resumed)
    f = full[full.ts >= r.ts.min()].reset_index(drop=True)
    assert np.array_equal(
        r["rolling_mean"].to_numpy(float), f["rolling_mean"].to_numpy(float),
        equal_nan=True,
    )


def test_diff_tail_state_resume(spark, series_df):
    diff_ = make_stateful(diff, state_n=1)
    cut = F.lit("2024-01-01 01:00:00").cast("timestamp")
    head = series_df.filter(F.col("ts") < cut)
    tail = series_df.filter(F.col("ts") >= cut)
    full = _sorted(diff(series_df, 1))
    _, st = diff_(head, 1)
    resumed, _ = diff_(tail, 1, state_df=st)
    r = _sorted(resumed)
    f = full[full.ts >= r.ts.min()].reset_index(drop=True)
    assert np.array_equal(r["diff"].to_numpy(float), f["diff"].to_numpy(float),
                          equal_nan=True)


def test_resume_cumsum_exact(spark, series_df):
    from pyg_timeseries_spark.operators.expanding import cumsum

    cut = F.lit("2024-01-01 02:30:00").cast("timestamp")
    head = series_df.filter(F.col("ts") < cut)
    tail = series_df.filter(F.col("ts") >= cut)
    full = _sorted(cumsum(series_df))
    st = expanding_state(head.filter(F.col("v").isNotNull()))
    resumed = _sorted(resume_cumsum(tail, st))
    f = full[full.ts >= resumed.ts.min()].reset_index(drop=True)
    g, e = resumed["cumsum"].to_numpy(float), f["cumsum"].to_numpy(float)
    both = ~(np.isnan(g) | np.isnan(e))
    assert (np.isnan(g) == np.isnan(e)).all()
    assert np.abs(g[both] - e[both]).max() < 1e-9


# ---- composites -------------------------------------------------------------

def test_ewmacd_matches_manual(spark, series_df):
    data, state = ewmacd_(series_df, 4, 12, vol=8)
    got = _sorted(data)["ewmacd"].to_numpy(float)

    fast = _sorted(ewma(series_df, 4, out="f"))["f"].to_numpy(float)
    slow = _sorted(ewma(series_df, 12, out="s"))["s"].to_numpy(float)
    rtn = diff(series_df, 1, out="r")
    vol = _sorted(ewmrms(rtn, 8, v="r", out="vv"))["vv"].to_numpy(float)
    exp = (fast - slow) / (np.where(vol == 0, np.nan, vol) * ou_factor(4, 12))
    both = ~(np.isnan(got) | np.isnan(exp))
    assert (np.isnan(got) == np.isnan(exp)).all()
    assert np.abs(got[both] - exp[both]).max() < 1e-12
    assert set(state) == {"fast", "slow", "vol", "diff"}
    for s in state.values():
        assert s is not None and s.count() == 3


def test_ewmacd_nested_state_resume(spark, series_df):
    cut = F.lit("2024-01-01 02:00:00").cast("timestamp")
    head = series_df.filter(F.col("ts") < cut)
    tail = series_df.filter(F.col("ts") >= cut)
    full, _ = ewmacd_(series_df, 4, 12, vol=8)
    fullp = _sorted(full)
    _, st = ewmacd_(head, 4, 12, vol=8)
    resumed, _ = ewmacd_(tail, 4, 12, vol=8, state=st)
    r = _sorted(resumed)
    f = fullp[fullp.ts >= r.ts.min()].reset_index(drop=True)
    assert np.array_equal(r["ewmacd"].to_numpy(float),
                          f["ewmacd"].to_numpy(float), equal_nan=True)


def test_ewmvol_equals_ewmrms_of_diff(spark, series_df):
    got = _sorted(ewmvol(series_df, 10))["ewmvol"].to_numpy(float)
    rtn = diff(series_df, 1, out="r")
    exp = _sorted(ewmrms(rtn, 10, v="r", out="e"))["e"].to_numpy(float)
    assert np.array_equal(got, exp, equal_nan=True)


# ---- zmooth / buffer --------------------------------------------------------

def test_zmooth_passthrough_when_quiet():
    """Small moves are never clamped → output equals input."""
    a = np.cumsum(np.full(100, 0.1))
    res, st = RK.zmooth(a, 10, max_move=4.2)
    assert np.allclose(res, a)


def test_zmooth_clamps_spike():
    a = np.concatenate([np.random.default_rng(0).normal(0, 1, 200).cumsum() * 0 + np.arange(200) * 0.1, [1000.0]])
    res, _ = RK.zmooth(a, 10, max_move=4.2)
    assert res[-1] < 500  # the spike is clamped toward the band edge


def test_buffer_hysteresis():
    a = np.array([0.0, 0.05, -0.05, 0.5, 0.45, -0.5])
    res, st = RK.buffer(a, band=0.1)
    # pos stays 0 while |a| <= band, then tracks band edges
    assert res[0] == 0.0 and res[1] == 0.0 and res[2] == 0.0
    assert res[3] == pytest.approx(0.4)
    assert res[4] == pytest.approx(0.4)  # inside [0.35, 0.55]
    assert res[5] == pytest.approx(-0.4)


def test_zmooth_buffer_state_split(spark, series_df):
    cut = F.lit("2024-01-01 02:00:00").cast("timestamp")
    head = series_df.filter(F.col("ts") < cut)
    tail = series_df.filter(F.col("ts") >= cut)
    for op, op_, kw, out in [
        (zmooth, zmooth_, dict(n=10, max_move=4.2), "zmooth"),
        (buffer, buffer_, dict(band=0.5), "buffer"),
    ]:
        full = _sorted(op(series_df, **kw))
        _, st = op_(head, **kw)
        resumed = _sorted(op(tail, state_df=st, **kw))
        f = full[full.ts >= resumed.ts.min()].reset_index(drop=True)
        assert np.array_equal(resumed[out].to_numpy(float),
                              f[out].to_numpy(float), equal_nan=True), out


# ---- xrank ------------------------------------------------------------------

def test_xrank_kernel_invariants():
    rng = np.random.default_rng(3)
    a = rng.normal(0, 1, 30)
    a[rng.random(30) < 0.2] = np.nan
    r = xrank_kernel(a, vol=-1.0)
    ok = ~np.isnan(a)
    assert (np.isnan(r) == ~ok).all()
    assert np.abs(np.mean(r[ok])) < 1e-12  # Σ w·r = 0 for equal weights
    order_a = np.argsort(a[ok])
    assert (np.diff(r[ok][order_a]) >= -1e-12).all()  # order preserving
    assert np.abs(r[ok]).max() < 1.0


def test_xrank_spark_matches_kernel(spark):
    pdf = pd.DataFrame({
        "key": [f"k{i}" for i in range(8)] * 3,
        "ts": np.repeat(pd.date_range("2024-01-01", periods=3, freq="1min"), 8),
        "v": np.random.default_rng(5).normal(0, 1, 24),
    })
    df = spark.createDataFrame(pdf)
    got = xrank(df, vol=-1.0).toPandas().sort_values(["ts", "key"])
    for t, g in got.groupby("ts"):
        exp = xrank_kernel(g.sort_values("key")["v"].to_numpy(), vol=-1.0)
        np.testing.assert_allclose(g.sort_values("key")["xrank"].to_numpy(), exp,
                                   atol=1e-12)


def test_xrank_simple_matches_kernel_hard(spark):
    pdf = pd.DataFrame({
        "key": [f"k{i}" for i in range(10)],
        "ts": [pd.Timestamp("2024-01-01")] * 10,
        "v": np.random.default_rng(6).normal(0, 1, 10),
    })
    df = spark.createDataFrame(pdf)
    got = xrank_simple(df).toPandas().sort_values("key")["xrank"].to_numpy()
    exp = xrank_kernel(pdf["v"].to_numpy(), vol=0.0)
    np.testing.assert_allclose(got, exp, atol=1e-12)
