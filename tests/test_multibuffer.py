"""multibuffer: kernel semantics vs a literal rendition of the reference
algorithm, Spark operator parity, state-split resume, cogrouped correlations.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.kernels import multibuffer_numpy as MB
from pyg_timeseries_spark.operators.multibuffer import multibuffer, multibuffer_


# ---- literal sequential rendition of the reference loop (oracle use) -------

def _ref_bisect(f, lb, ub, n=0, aim=np.nan):
    flb, fub = f(lb), f(ub)
    for _ in range(n or 10):
        if fub * flb >= 0:
            break
        mid = (lb + ub) / 2
        fmid = f(mid)
        if flb * fmid < 0:
            ub, fub = mid, fmid
        else:
            lb, flb = mid, fmid
    mid = (lb + ub) / 2
    if np.isnan(aim):
        return mid
    if f(aim) == f(mid):
        return aim
    return lb if aim < mid else ub


def _ref_buffer_row(prev, tgt, band, unit, rounding_band):
    out = prev.copy()
    for j in range(len(tgt)):
        a = tgt[j]
        if np.isnan(a):
            continue
        b = 0.0 if np.isnan(band[j]) else band[j]
        if unit:
            bu = max(b / unit, rounding_band)
            au = a / unit
            r = lambda x: np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5)
            lo, hi = r(au - bu) * unit, r(au + bu) * unit
        else:
            lo, hi = a - b, a + b
        p = out[j]
        out[j] = lo if p < lo else (hi if p > hi else p)
    return out


def _ref_single_step(tgt, ptgt, band, pv, vol, corr, prev, unit, prev_m, rb,
                     rounding_band=0.0):
    pvv = pv * vol
    pvv = np.where(np.isnan(pvv), 0.0, pvv)
    cw = corr * np.outer(pvv, pvv)
    cw[np.isnan(cw)] = 0.0
    tgt = np.where(np.isnan(tgt), 0.0, tgt)
    ptgt = np.where(np.isnan(ptgt), 0.0, ptgt)
    t_risk = np.sqrt(max(tgt @ cw @ tgt, 0.0))

    def mism(pos, tm=1.0):
        if t_risk == 0:
            return 0.0
        return np.sqrt(max(pos @ cw @ pos, 0.0)) / t_risk - tm

    def step(m):
        return _ref_buffer_row(prev.copy(), ptgt * m, band, unit, rounding_band)

    m = prev_m
    pos = step(m)
    mis = mism(pos)
    if mis < -rb:
        m = _ref_bisect(lambda x: mism(step(x), 1 - rb), prev_m, prev_m + rb,
                        5, aim=prev_m)
        pos = step(m)
        if mism(pos) > rb:
            m = prev_m
            pos = step(m)
    elif mis > rb:
        m = _ref_bisect(lambda x: mism(step(x), 1 + rb), prev_m - rb, prev_m,
                        5, aim=prev_m)
        pos = step(m)
        if mism(pos) < -rb:
            m = prev_m
            pos = step(m)
    return m, pos, mism(pos)


def _panel(T=60, k=4, seed=11):
    rng = np.random.default_rng(seed)
    target = rng.normal(0, 4, (T, k)).cumsum(axis=0) * 0.2
    target[rng.random((T, k)) < 0.1] = np.nan
    band = np.full((T, k), 0.4)
    vol = np.abs(rng.normal(1, 0.2, (T, k))) + 0.2
    pv = np.full((T, k), 0.5)
    corr = MB.near_correlation_matrix(0.4, k)
    return target, band, vol, pv, corr


def test_kernel_matches_literal_reference_loop():
    target, band, vol, pv, corr = _panel()
    got_pos, got_m, got_mis, _ = MB.multibuffer_sweep(target, band, vol, pv, corr)
    prev = np.zeros(target.shape[1])
    m = 1.0
    for i in range(target.shape[0]):
        m, prev, mis = _ref_single_step(
            target[i].copy(), target[i].copy(), band[i], pv[i], vol[i], corr,
            prev, 1.0, m, 0.1)
        assert np.array_equal(got_pos[i], prev), i
        assert got_m[i] == m and abs(got_mis[i] - mis) < 1e-15, i


def test_kernel_invariants():
    target, band, vol, pv, corr = _panel(T=120, k=3, seed=7)
    pos, mult, mis, _ = MB.multibuffer_sweep(target, band, vol, pv, corr,
                                             unit=1.0)
    # positions are integers (unit=1)
    assert np.allclose(pos, np.round(pos))
    # multiplier stays near 1 (bounded drift per step by risk_band)
    assert (np.abs(np.diff(mult)) <= 0.1 + 1e-12).all()


def test_kernel_state_split_bitexact():
    target, band, vol, pv, corr = _panel(T=90, k=4, seed=3)
    full_pos, full_m, full_mis, full_s = MB.multibuffer_sweep(
        target, band, vol, pv, corr)
    for cut in (1, 13, 57):
        p1, m1, x1, s = MB.multibuffer_sweep(
            target[:cut], band[:cut], vol[:cut], pv[:cut], corr)
        p2, m2, x2, s2 = MB.multibuffer_sweep(
            target[cut:], band[cut:], vol[cut:], pv[cut:], corr, state=s)
        assert np.array_equal(np.vstack([p1, p2]), full_pos), cut
        assert np.array_equal(np.concatenate([m1, m2]), full_m), cut
        assert np.array_equal(s2, full_s), cut


def _long_df(spark, target, band, vol, pv, ts0="2024-01-01"):
    T, k = target.shape
    rows = []
    times = pd.date_range(ts0, periods=T, freq="1D")
    for i in range(T):
        for j in range(k):
            rows.append(("p1", times[i], f"a{j}", target[i, j], band[i, j],
                         vol[i, j], pv[i, j]))
    pdf = pd.DataFrame(rows, columns=["key", "ts", "asset", "target", "band",
                                      "vol", "pv"])
    return spark.createDataFrame(pdf)


def test_spark_matches_kernel(spark):
    target, band, vol, pv, corr = _panel(T=40, k=3, seed=5)
    df = _long_df(spark, target, band, vol, pv)
    out = multibuffer(df, corr=0.4).toPandas().sort_values(
        ["ts", "asset"]).reset_index(drop=True)
    exp_pos, exp_m, exp_mis, _ = MB.multibuffer_sweep(
        np.where(np.isnan(target), np.nan, target), band, vol, pv, corr)
    got = out.pivot(index="ts", columns="asset", values="pos").to_numpy()
    assert np.array_equal(got, exp_pos)
    gm = out[out.asset == "a0"].sort_values("ts")["mult"].to_numpy()
    assert np.array_equal(gm, exp_m)


def test_spark_state_split(spark):
    target, band, vol, pv, _ = _panel(T=50, k=3, seed=9)
    df = _long_df(spark, target, band, vol, pv)
    cut = F.lit("2024-01-21").cast("timestamp")
    full = multibuffer(df, corr=0.4).toPandas()
    _, st = multibuffer_(df.filter(F.col("ts") < cut), corr=0.4)
    resumed = multibuffer(df.filter(F.col("ts") >= cut), corr=0.4,
                          state_df=st).toPandas()
    f = full[full.ts >= resumed.ts.min()].sort_values(
        ["ts", "asset"]).reset_index(drop=True)
    r = resumed.sort_values(["ts", "asset"]).reset_index(drop=True)
    assert np.array_equal(r["pos"].to_numpy(), f["pos"].to_numpy())
    assert np.array_equal(r["mult"].to_numpy(), f["mult"].to_numpy())


def test_spark_cogrouped_melted_corr(spark):
    """Melted constant correlation frame == the same matrix passed to the
    kernel."""
    target, band, vol, pv, corr = _panel(T=30, k=3, seed=13)
    df = _long_df(spark, target, band, vol, pv)
    melted = []
    for i in range(3):
        for j in range(i + 1, 3):
            melted.append(("p1", f"a{i}", f"a{j}", corr[i, j]))
    cdf = spark.createDataFrame(
        pd.DataFrame(melted, columns=["key", "asset_i", "asset_j", "cor"]))
    out = multibuffer(df, corr=cdf).toPandas()
    exp_pos, _, _, _ = MB.multibuffer_sweep(target, band, vol, pv, corr)
    got = out.pivot(index="ts", columns="asset", values="pos").to_numpy()
    assert np.array_equal(got, exp_pos)
