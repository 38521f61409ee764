"""Pairwise EWM, bars/OHLC, ewfill, codec, PSD repair."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.compress.cor_codec import (
    decode_correlations, encode_correlations, encode_cor_col, decode_cor_col,
)
from pyg_timeseries_spark.functions import psd as PSD
from pyg_timeseries_spark.kernels import pairwise_numpy as PK
from pyg_timeseries_spark.kernels.recurrence_numpy import ewfill as ewfill_kernel
from pyg_timeseries_spark.operators import bars as B
from pyg_timeseries_spark.operators.ewm import ewmvar
from pyg_timeseries_spark.operators.fill import ewfill, fnna_like, fnnz
from pyg_timeseries_spark.operators.pairwise import (
    ewmcorrelation, ewmcovariance, ewmxcor, ewmxcor_, ewmxLR,
)


# ---- pairwise kernels -------------------------------------------------------

def test_ewmxcor_self_is_one():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 500)
    # biased: cor(a, a) ≡ 1; unbiased divides the denominator variance by
    # r = 1 - w2/t0² (the reference's stdev_calculation_ewm does the same),
    # so the self-correlation converges to r < 1 — assert both behaviors.
    res, _ = PK.ewmxcor(a, a.copy(), 10, bias=True)
    assert np.nanmax(np.abs(res[5:] - 1.0)) < 1e-9
    res_u, _ = PK.ewmxcor(a, a.copy(), 10)
    w = 10.0 / 11.0
    r_limit = 1.0 - (1 - w) / (1 + w)  # steady-state 1 - w2/t0²
    assert abs(res_u[-1] - r_limit) < 1e-6


def test_ewmxLR_exact_line():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 1, 300)
    b = 2.0 * a + 3.0
    # biased: exact recovery (numerator covariance and denominator variance
    # share the same normalization); the unbiased default scales m by the
    # r-correction, mirroring the reference's LR_calculation_ewm.
    c, m, _ = PK.ewmxLR(a, b, 10, bias=True)
    assert np.nanmax(np.abs(m[10:] - 2.0)) < 1e-8
    assert np.nanmax(np.abs(c[10:] - 3.0)) < 1e-8


def test_ewmxcor_state_split():
    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, 400)
    b = rng.normal(0, 1, 400) + 0.5 * a
    a[rng.random(400) < 0.2] = np.nan
    full, _ = PK.ewmxcor(a, b, 10)
    head, s = PK.ewmxcor(a[:150], b[:150], 10)
    tail, _ = PK.ewmxcor(a[150:], b[150:], 10, state=s)
    assert np.array_equal(np.concatenate([head, tail]), full, equal_nan=True)


def test_ewmxcovar_diag_equals_biased_var(spark, series_df):
    two = series_df.withColumn("v2", F.col("v"))
    cov = ewmcovariance(two.select("key", "ts", "v"), 10)
    diag = cov.filter(F.col("key_i") == F.col("key_j"))
    got = (
        diag.toPandas().rename(columns={"key_i": "key"})
        .sort_values(["key", "ts"]).reset_index(drop=True)
    )
    var = ewmvar(series_df, 10, bias=True, min_periods=0, min_sample=0)
    exp = var.toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    m = got.merge(exp[["key", "ts", "ewmvar"]], on=["key", "ts"])
    g = m["cov"].to_numpy(float)
    e = m["ewmvar"].to_numpy(float)
    both = ~(np.isnan(g) | np.isnan(e))
    assert both.sum() > 500
    assert np.abs(g[both] - e[both]).max() < 1e-10


def test_ewmxcor_spark_and_state(spark, series_df):
    two = series_df.withColumn("v2", F.col("v") * 0.5 + F.lit(1.0))
    cut = F.lit("2024-01-01 02:00:00").cast("timestamp")
    full = ewmxcor(two, 10, "v", "v2").toPandas().sort_values(["key", "ts"])
    _, st = ewmxcor_(two.filter(F.col("ts") < cut), 10, "v", "v2")
    resumed = ewmxcor(two.filter(F.col("ts") >= cut), 10, "v", "v2", state_df=st)
    r = resumed.toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    f = full[full.ts >= r.ts.min()].reset_index(drop=True)
    assert np.array_equal(r["ewmxcor"].to_numpy(float),
                          f["ewmxcor"].to_numpy(float), equal_nan=True)


def test_ewmxcor_same_time_replaces():
    """A duplicate clock value must REPLACE the previous in-bucket
    contribution (reference _ewmx, _ewm.py:247-263), not stack on top:
    the sweep over [..., x_old@t, x_new@t] ends in the same state as the
    sweep over [..., x_new@t]."""
    rng = np.random.default_rng(3)
    a = rng.normal(0, 1, 50)
    b = rng.normal(0, 1, 50)
    t = np.arange(50, dtype=float)
    t[30] = t[29]  # rows 29,30 share a clock value
    dup, s_dup = PK.ewmxcor(a, b, 10, time=t)
    # drop the overwritten row 29 → identical trailing state and outputs
    keep = np.ones(50, bool)
    keep[29] = False
    solo, s_solo = PK.ewmxcor(a[keep], b[keep], 10, time=t[keep])
    # subtract-then-add vs direct accumulate: algebraically identical,
    # float-equal only to rounding — hence allclose, not array_equal
    assert np.allclose(s_dup, s_solo, atol=1e-12, equal_nan=True)
    assert np.allclose(dup[31:], solo[30:], atol=1e-10, equal_nan=True)


def test_ewmxcor_same_time_state_split():
    """Resume split INSIDE a time bucket still replaces the right
    contribution — (pa, pb) ride the state."""
    rng = np.random.default_rng(4)
    a = rng.normal(0, 1, 40)
    b = rng.normal(0, 1, 40)
    t = np.repeat(np.arange(20.0), 2)  # every clock value twice
    full, _ = PK.ewmxcor(a, b, 10, time=t)
    k = 15  # split lands mid-bucket (t[14] == t[15])
    head, s = PK.ewmxcor(a[:k], b[:k], 10, time=t[:k])
    tail, _ = PK.ewmxcor(a[k:], b[k:], 10, time=t[k:], state=s)
    assert np.array_equal(np.concatenate([head, tail]), full, equal_nan=True)


def test_ewmcorrelation_stateful_split(spark, series_df):
    """Melted tensor stateful form: resume from per-pair state == full."""
    from pyg_timeseries_spark.operators.pairwise import ewmcorrelation_

    cut = F.lit("2024-01-01 02:00:00").cast("timestamp")
    full = ewmcorrelation(series_df, 10).toPandas().sort_values(
        ["key_i", "key_j", "ts"]).reset_index(drop=True)
    _, st = ewmcorrelation_(series_df.filter(F.col("ts") < cut), 10)
    assert {f.name for f in st.schema.fields} == {"key_i", "key_j", "state"}
    resumed = ewmcorrelation(
        series_df.filter(F.col("ts") >= cut), 10, state_df=st
    ).toPandas().sort_values(["key_i", "key_j", "ts"]).reset_index(drop=True)
    f = full[full.ts >= resumed.ts.min()].reset_index(drop=True)
    assert np.array_equal(resumed["cor"].to_numpy(float),
                          f["cor"].to_numpy(float), equal_nan=True)


def test_ewmcorrelation_melted(spark, series_df):
    cor = ewmcorrelation(series_df, 10).toPandas()
    assert set(zip(cor.key_i, cor.key_j)) == {("k0", "k1"), ("k0", "k2"), ("k1", "k2")}
    vals = cor["cor"].dropna()
    assert (vals.abs() <= 1 + 1e-9).all()


# ---- bars -------------------------------------------------------------------

def _bar_frame(spark):
    rng = np.random.default_rng(7)
    n = 200
    c = rng.normal(0, 1, n).cumsum() + 100
    o = np.roll(c, 1) + rng.normal(0, 0.1, n)
    h = np.maximum(o, c) + np.abs(rng.normal(0, 0.5, n))
    low = np.minimum(o, c) - np.abs(rng.normal(0, 0.5, n))
    pdf = pd.DataFrame({
        "key": "k0",
        "ts": pd.date_range("2024-01-01", periods=n, freq="1D"),
        "open": o, "high": h, "low": low, "close": c,
    })
    return spark.createDataFrame(pdf), pdf


def test_bar_r2_models(spark):
    df, pdf = _bar_frame(spark)
    for model in ["cc", "p", "rs", "gk", "yz"]:
        out = B.bar_r2(df, model=model).toPandas().sort_values("ts")
        r2 = out["r2"].to_numpy(float)[1:]
        if model in ("cc", "p"):
            assert (r2 >= 0).all(), model
        assert np.isfinite(r2).all(), model
    # cc model == (c1-c0)^2 exactly
    out = B.bar_r2(df, model="cc").toPandas().sort_values("ts")
    exp = (pdf["close"].diff() ** 2).to_numpy()
    got = out["r2"].to_numpy(float)
    assert np.allclose(got[1:], exp[1:], atol=1e-12)


def test_bar_daily_to_eod(spark):
    # 3 days × 4 intraday "day-so-far" bars: volume grows within a day
    rows = []
    for d in range(3):
        for i in range(4):
            rows.append((
                "k0", pd.Timestamp(f"2024-01-0{d+1} {9+i}:00:00"),
                100.0 + d, 100.0 + d + i * 0.1, float((i + 1) * 10),
            ))
    pdf = pd.DataFrame(rows, columns=["key", "ts", "open", "close", "volume"])
    df = spark.createDataFrame(pdf)
    eod = B.bar_daily_to_eod(df).toPandas().sort_values("ts")
    assert len(eod) == 3
    assert (eod["volume"] == 40.0).all()  # last bar of each day
    assert np.allclose(eod["close"].to_numpy(), [100.3, 101.3, 102.3])


def test_overlapping_returns_reference_vector(spark):
    a = [np.nan, np.nan, 1.0, 2.0, np.nan, 3.0, np.nan, np.nan, np.nan, np.nan]
    pdf = pd.DataFrame({
        "key": "k0",
        "ts": pd.date_range("2024-01-01", periods=10, freq="1D"),
        "v": a,
    })
    df = spark.createDataFrame(pdf).withColumn(
        "v", F.when(F.isnan("v"), None).otherwise(F.col("v"))
    )
    out = B.overlapping_returns(df, 3).toPandas().sort_values("ts")
    exp = [np.nan, np.nan, 1, 3, 3, 5, 3, 3, np.nan, np.nan]
    assert np.array_equal(out["overlapping"].to_numpy(float), exp, equal_nan=True)


# ---- ewfill / fnnz / fnna_like ---------------------------------------------

def _ewfill_sequential(a, fwd_n, bwd_n=None, target=0.0):
    """Literal sequential rendition of the reference loop for oracle use."""
    w = fwd_n / (fwd_n + 1) if fwd_n >= 1 else fwd_n
    bw = w if bwd_n is None else (bwd_n / (bwd_n + 1) if bwd_n >= 1 else bwd_n)
    res = a.copy().astype(float)
    prev = target
    f = 1.0
    for j in range(len(a)):
        if np.isnan(a[j]):
            f *= w
            res[j] = 0.5 * (prev * f + (1 - f) * target)
        else:
            f = 1.0
            prev = res[j]
    nxt = target
    b = 1.0
    for j in range(len(a) - 1, -1, -1):
        if np.isnan(a[j]):
            b *= bw
            res[j] += 0.5 * (nxt * b + (1 - b) * target)
        else:
            b = 1.0
            nxt = res[j]
    return res


def test_ewfill_kernel_matches_sequential():
    rng = np.random.default_rng(9)
    a = rng.normal(1, 1, 200)
    a[rng.random(200) < 0.4] = np.nan
    got, _ = ewfill_kernel(a, 5, 3, decay_target=0.5)
    exp = _ewfill_sequential(a, 5, 3, target=0.5)
    assert np.allclose(got, exp, atol=1e-12, equal_nan=True)


def test_ewfill_spark(spark, series_df):
    out = ewfill(series_df, 5, out="filled").toPandas()
    assert out["filled"].notna().all()


def test_fnnz_fnna_like(spark, series_df):
    z = series_df.withColumn(
        "v", F.when(F.col("ts") < F.lit("2024-01-01 00:30:00").cast("timestamp"),
                    F.lit(0.0)).otherwise(F.col("v"))
    )
    first_nz = fnnz(z).toPandas()
    assert (first_nz["ts"] >= pd.Timestamp("2024-01-01 00:30:00")).all()

    masked = fnna_like(series_df, z.withColumn(
        "v", F.when(F.col("v") != 0, F.col("v"))
    ))
    pdf = masked.toPandas()
    early = pdf[pdf.ts < pd.Timestamp("2024-01-01 00:30:00")]
    assert early["v"].isna().all()


# ---- codec / psd ------------------------------------------------------------

def test_cor_codec_roundtrip():
    c = np.array([[1.0, 0.505, np.nan], [0.505, 1.0, -0.123], [np.nan, -0.123, 1.0]])
    for dtype, tol in [("int8", 0.0051), ("int16", 5.1e-5)]:
        packed = encode_correlations(c, dtype)
        assert packed.dtype == np.dtype(dtype)
        back = decode_correlations(packed)
        assert np.isnan(back[0, 2]) and np.isnan(back[2, 0])
        ok = ~np.isnan(c)
        assert np.abs(back[ok] - c[ok]).max() <= tol


def test_cor_codec_spark(spark):
    pdf = pd.DataFrame({"i": [0, 1, 2, 3], "cor": [1.0, 0.505, None, -0.123]})
    df = spark.createDataFrame(pdf)
    out = df.withColumn("p", encode_cor_col(F.col("cor"), "int8")).withColumn(
        "b", decode_cor_col(F.col("p"), "int8")
    ).toPandas().sort_values("i").reset_index(drop=True)
    # Spark round() goes through BigDecimal.valueOf (decimal repr "50.5"
    # -> HALF_UP -> 51) while numpy rounds the binary double (50.4999... ->
    # 50); both are within codec resolution
    assert out["p"].tolist()[0] == 100 and out["p"].tolist()[1] in (50, 51)
    assert out["p"].tolist()[2:] == [127, -12]
    assert out["b"][2] is None or np.isnan(out["b"][2])


def test_psd_repair():
    c = np.array([
        [1.0, 0.9, -0.9],
        [0.9, 1.0, 0.9],
        [-0.9, 0.9, 1.0],
    ])  # not PSD
    assert PSD.min_eigenvalue(c) < 0
    rep = PSD.psd_correlation(c)
    assert PSD.min_eigenvalue(rep) >= -1e-10
    assert np.allclose(np.diag(rep), 1.0)
    assert np.allclose(rep, rep.T)


def test_repair_melted(spark):
    rows = [
        (pd.Timestamp("2024-01-01"), "a", "b", 0.9),
        (pd.Timestamp("2024-01-01"), "a", "c", -0.9),
        (pd.Timestamp("2024-01-01"), "b", "c", 0.9),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["ts", "key_i", "key_j", "cor"]))
    out = PSD.repair_melted(df).toPandas()
    assert len(out) == 3
    c = np.eye(3)
    idx = {"a": 0, "b": 1, "c": 2}
    for r in out.itertuples(index=False):
        c[idx[r.key_i], idx[r.key_j]] = c[idx[r.key_j], idx[r.key_i]] = r.cor
    assert PSD.min_eigenvalue(c) >= -1e-9


def test_matmul_nan_masked():
    a = np.array([[1.0, np.nan], [np.nan, np.nan]])
    b = np.array([[2.0], [3.0]])
    res = PSD.matmul(a, b)
    assert res[0, 0] == 2.0
    assert np.isnan(res[1, 0])


def test_reindex_melted_ffill_and_exact(spark):
    """reindex_3d long-format rendition: as-of ffill onto a denser axis and
    exact-match mode."""
    import pandas as pd

    from pyg_timeseries_spark.operators.reindex import reindex_melted

    tens = spark.createDataFrame(pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01", "2024-01-03", "2024-01-05"]),
        "key_i": "a", "key_j": "b", "cor": [0.1, 0.3, 0.5],
    }))
    idx = spark.createDataFrame(pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=6, freq="1D")}))
    out = reindex_melted(tens, idx).toPandas().sort_values("ts")
    assert out["cor"].tolist() == [0.1, 0.1, 0.3, 0.3, 0.5, 0.5]
    exact = reindex_melted(tens, idx, method=None).toPandas().sort_values("ts")
    got = exact["cor"].tolist()
    assert got[0] == 0.1 and got[2] == 0.3 and got[4] == 0.5
    assert pd.isna(got[1]) and pd.isna(got[3]) and pd.isna(got[5])
