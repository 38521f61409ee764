"""Pandas-parity tier (reference test strategy #1, SURVEY.md §5):
every operator vs its pandas equivalent computed on the NaN-skipped series,
reindexed back — which is simultaneously the NaN-skip identity (tier #2).
"""

import numpy as np
import pandas as pd
import pytest

from pyg_timeseries_spark.operators import expanding as E
from pyg_timeseries_spark.operators import ewm as M
from pyg_timeseries_spark.operators import fill as G
from pyg_timeseries_spark.operators import rolling as R
from pyg_timeseries_spark.operators import shift as S
from pyg_timeseries_spark.operators import ts as TSOPS

N = 10
TOL = 1e-11


def collect_out(df, out, key="key", ts="ts"):
    pdf = df.toPandas()
    pdf[ts] = pdf[ts].astype("datetime64[ns]")
    return pdf.sort_values([key, ts]).reset_index(drop=True)


def pandas_per_key(series_pdf, fn):
    """Apply fn to the null-dropped series per key, reindex back (NaN-skip)."""
    outs = []
    for k, g in series_pdf.groupby("key"):
        g = g.sort_values("ts").set_index("ts")
        dense = g["v"].dropna()
        res = fn(dense).reindex(g.index)
        outs.append(pd.DataFrame({"key": k, "ts": g.index, "expected": res.values}))
    return pd.concat(outs, ignore_index=True)


def check(series_df, series_pdf, op_df, out, pandas_fn, tol=TOL):
    got = collect_out(op_df, out)[["key", "ts", out]]
    exp = pandas_per_key(series_pdf, pandas_fn)
    m = got.merge(exp, on=["key", "ts"], how="outer")
    assert len(m) == len(series_pdf)
    g, e = m[out].to_numpy(float), m["expected"].to_numpy(float)
    both = ~(np.isnan(g) | np.isnan(e))
    assert (np.isnan(g) == np.isnan(e)).all(), "NaN pattern mismatch"
    assert np.abs(g[both] - e[both]).max() < tol


# ---- rolling ----------------------------------------------------------------

def test_rolling_mean(series_df, series_pdf):
    check(series_df, series_pdf, R.rolling_mean(series_df, N), "rolling_mean",
          lambda s: s.rolling(N).mean())


def test_rolling_sum(series_df, series_pdf):
    check(series_df, series_pdf, R.rolling_sum(series_df, N), "rolling_sum",
          lambda s: s.rolling(N).sum())


def test_rolling_std(series_df, series_pdf):
    check(series_df, series_pdf, R.rolling_std(series_df, N), "rolling_std",
          lambda s: s.rolling(N).std())


def test_rolling_skew(series_df, series_pdf):
    check(series_df, series_pdf, R.rolling_skew(series_df, N), "rolling_skew",
          lambda s: s.rolling(N).skew(), tol=1e-9)


def test_rolling_rms(series_df, series_pdf):
    check(series_df, series_pdf, R.rolling_rms(series_df, N), "rolling_rms",
          lambda s: np.sqrt((s ** 2).rolling(N).mean()))


def test_rolling_min_max(series_df, series_pdf):
    check(series_df, series_pdf, R.rolling_min(series_df, N), "rolling_min",
          lambda s: s.rolling(N).min())
    check(series_df, series_pdf, R.rolling_max(series_df, N), "rolling_max",
          lambda s: s.rolling(N).max())


def test_rolling_median(series_df, series_pdf):
    check(series_df, series_pdf, R.rolling_median(series_df, N), "rolling_median",
          lambda s: s.rolling(N).median())


def test_rolling_quantile(series_df, series_pdf):
    check(series_df, series_pdf, R.rolling_quantile(series_df, N, 0.25), "rolling_quantile",
          lambda s: s.rolling(N).quantile(0.25, interpolation="linear"))


# ---- expanding --------------------------------------------------------------

def test_cumsum(series_df, series_pdf):
    check(series_df, series_pdf, E.cumsum(series_df), "cumsum",
          lambda s: s.expanding().sum())


def test_expanding_mean(series_df, series_pdf):
    check(series_df, series_pdf, E.expanding_mean(series_df), "expanding_mean",
          lambda s: s.expanding().mean())


def test_expanding_std(series_df, series_pdf):
    check(series_df, series_pdf, E.expanding_std(series_df), "expanding_std",
          lambda s: s.expanding().std())


def test_expanding_skew(series_df, series_pdf):
    check(series_df, series_pdf, E.expanding_skew(series_df), "expanding_skew",
          lambda s: s.expanding().skew(), tol=1e-9)


def test_expanding_min_max(series_df, series_pdf):
    check(series_df, series_pdf, E.expanding_min(series_df), "expanding_min",
          lambda s: s.expanding().min())
    check(series_df, series_pdf, E.expanding_max(series_df), "expanding_max",
          lambda s: s.expanding().max())


def test_cumprod(series_df, series_pdf):
    check(series_df, series_pdf, E.cumprod(series_df), "cumprod",
          lambda s: s.expanding().apply(np.prod, raw=True), tol=1e-8)


# ---- shift family -----------------------------------------------------------

def test_shift(series_df, series_pdf):
    check(series_df, series_pdf, S.shift(series_df, 1), "shift",
          lambda s: s.shift(1))


def test_diff(series_df, series_pdf):
    check(series_df, series_pdf, S.diff(series_df, 2), "diff",
          lambda s: s.diff(2))


def test_ratio(series_df, series_pdf):
    check(series_df, series_pdf, S.ratio(series_df, 1), "ratio",
          lambda s: s / s.shift(1))


# ---- ffill / bfill ----------------------------------------------------------

def test_ffill(series_df, series_pdf):
    got = collect_out(G.ffill(series_df, out="f"), "f")
    exp = (
        series_pdf.sort_values(["key", "ts"])
        .groupby("key")["v"].ffill().reset_index(drop=True)
    )
    g, e = got["f"].to_numpy(float), exp.to_numpy(float)
    assert (np.isnan(g) == np.isnan(e)).all()
    assert np.array_equal(g[~np.isnan(g)], e[~np.isnan(e)])


def test_bfill(series_df, series_pdf):
    got = collect_out(G.bfill(series_df, out="b"), "b")
    exp = (
        series_pdf.sort_values(["key", "ts"])
        .groupby("key")["v"].bfill().reset_index(drop=True)
    )
    g, e = got["b"].to_numpy(float), exp.to_numpy(float)
    assert (np.isnan(g) == np.isnan(e)).all()
    assert np.array_equal(g[~np.isnan(g)], e[~np.isnan(e)])


def test_ffill_limit(series_df, series_pdf):
    got = collect_out(G.ffill(series_df, n=2, out="f"), "f")
    exp = (
        series_pdf.sort_values(["key", "ts"])
        .groupby("key")["v"].ffill(limit=2).reset_index(drop=True)
    )
    g, e = got["f"].to_numpy(float), exp.to_numpy(float)
    assert (np.isnan(g) == np.isnan(e)).all()


# ---- ewm --------------------------------------------------------------------

def test_ewma(series_df, series_pdf):
    check(series_df, series_pdf, M.ewma(series_df, N), "ewma",
          lambda s: s.ewm(com=N).mean())


def test_ewmrms(series_df, series_pdf):
    check(series_df, series_pdf, M.ewmrms(series_df, N), "ewmrms",
          lambda s: np.sqrt((s ** 2).ewm(com=N).mean()))


def test_ewmstd(series_df, series_pdf):
    check(series_df, series_pdf, M.ewmstd(series_df, N, min_periods=0, min_sample=0),
          "ewmstd", lambda s: s.ewm(com=N).std())


def test_ewmvar(series_df, series_pdf):
    check(series_df, series_pdf, M.ewmvar(series_df, N, min_periods=0, min_sample=0),
          "ewmvar", lambda s: s.ewm(com=N).var())


# ---- ts_* -------------------------------------------------------------------

def test_ts_aggregates(spark, series_df, series_pdf):
    per_key = series_pdf.groupby("key")["v"]
    for op, fn in [
        (TSOPS.ts_mean, per_key.mean()),
        (TSOPS.ts_std, per_key.std()),
        (TSOPS.ts_min, per_key.min()),
        (TSOPS.ts_max, per_key.max()),
        (TSOPS.ts_median, per_key.median()),
        (TSOPS.ts_sum, per_key.sum()),
    ]:
        got = op(series_df).toPandas().set_index("key").iloc[:, 0].sort_index()
        np.testing.assert_allclose(got.to_numpy(float), fn.sort_index().to_numpy(float),
                                   rtol=0, atol=1e-10)
    skew = TSOPS.ts_skew(series_df).toPandas().set_index("key")["ts_skew"].sort_index()
    np.testing.assert_allclose(skew.to_numpy(float),
                               per_key.skew().sort_index().to_numpy(float), atol=1e-9)


def test_ts_quantile_multi(spark, series_df, series_pdf):
    """List-q ts_quantile: one percentile(v, array(...)) aggregate — plan
    has exactly ONE Aggregate pair (no self-join) — and values match
    np.nanquantile (linear interpolation) per requested q."""
    out = TSOPS.ts_quantile(series_df, [0.1, 0.5, 0.9], out=["p10", "p50", "p90"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    got = out.toPandas().set_index("key").sort_index()
    per_key = series_pdf.groupby("key")["v"]
    for col, q in (("p10", 0.1), ("p50", 0.5), ("p90", 0.9)):
        exp = per_key.apply(lambda s, q=q: np.nanquantile(s.dropna(), q)).sort_index()
        np.testing.assert_allclose(got[col].to_numpy(float),
                                   exp.to_numpy(float), atol=1e-10)
    # scalar form unchanged; default list names get _p{100q:g} suffixes
    one = TSOPS.ts_quantile(series_df, 0.5, out="m").toPandas().set_index("key")
    np.testing.assert_allclose(one["m"].sort_index().to_numpy(float),
                               per_key.median().sort_index().to_numpy(float),
                               atol=1e-10)
    named = TSOPS.ts_quantile(series_df, [0.25], out="q")
    assert named.columns == ["key", "q_p25"]
