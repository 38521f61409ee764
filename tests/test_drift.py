"""PSI drift monitor vs a literal numpy reference, including the
empty-bin Laplace correction and the shifted-distribution sanity check."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyg_timeseries_spark.functions.drift import psi_drift, value_bin


def _ref_psi(ref_vals, cur_vals, lo, hi, bins, smooth=0.5):
    def hist(vals):
        b = np.clip(((np.asarray(vals) - lo) / ((hi - lo) / bins)).astype(int),
                    0, bins - 1)
        return np.bincount(b, minlength=bins)

    hr, hc = hist(ref_vals), hist(cur_vals)
    pr = (hr + smooth) / (hr.sum() + smooth * bins)
    pc = (hc + smooth) / (hc.sum() + smooth * bins)
    return float(((pc - pr) * np.log(pc / pr)).sum())


def _frame(rng, n=4000, shift=0.0):
    half = n // 2
    return pd.DataFrame(
        {
            "key": ["k"] * n,
            "period": ["ref"] * half + ["cur"] * (n - half),
            "v": np.concatenate(
                [rng.normal(5, 1, half), rng.normal(5 + shift, 1, n - half)]
            ),
        }
    )


def test_psi_matches_reference(spark):
    rng = np.random.default_rng(61)
    pdf = _frame(rng, shift=0.8)
    df = spark.createDataFrame(pdf)
    got = psi_drift(
        df, F.col("period") == "ref", F.col("period") == "cur",
        key="key", v="v", lo=0.0, hi=10.0, bins=10,
    ).first()
    exp = _ref_psi(
        pdf[pdf.period == "ref"]["v"], pdf[pdf.period == "cur"]["v"],
        0.0, 10.0, 10,
    )
    assert abs(got["psi"] - exp) < 1e-12
    assert got["n_ref"] == 2000 and got["n_cur"] == 2000


def test_psi_empty_bin_correction(spark):
    """Narrow data over wide edges: most bins are empty for the key; the
    closed-form absent-bin term must reproduce the full-histogram PSI."""
    rng = np.random.default_rng(62)
    pdf = _frame(rng, n=600, shift=0.3)
    df = spark.createDataFrame(pdf)
    got = psi_drift(
        df, F.col("period") == "ref", F.col("period") == "cur",
        key="key", v="v", lo=-100.0, hi=100.0, bins=50,
    ).first()
    exp = _ref_psi(
        pdf[pdf.period == "ref"]["v"], pdf[pdf.period == "cur"]["v"],
        -100.0, 100.0, 50,
    )
    assert abs(got["psi"] - exp) < 1e-12


def test_psi_orders_by_shift(spark):
    rng = np.random.default_rng(63)
    vals = {}
    for shift in (0.0, 0.5, 2.0):
        pdf = _frame(rng, shift=shift)
        got = psi_drift(
            spark.createDataFrame(pdf),
            F.col("period") == "ref", F.col("period") == "cur",
            key="key", v="v", lo=0.0, hi=12.0, bins=12,
        ).first()
        vals[shift] = got["psi"]
    assert vals[0.0] < 0.05          # same distribution: stable
    assert vals[0.0] < vals[0.5] < vals[2.0]
    assert vals[2.0] > 0.25          # major shift flagged


def test_value_bin_clamps(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": [-5.0, 0.0, 4.9, 99.0]}))
    got = [r[0] for r in df.select(value_bin(F.col("v"), 0.0, 5.0, 5)).collect()]
    assert got == [0, 0, 4, 4]


def _ref_ks(a, b):
    a, b = np.sort(np.asarray(a)), np.sort(np.asarray(b))
    pts = np.concatenate([a, b])
    fa = np.searchsorted(a, pts, side="right") / len(a)
    fb = np.searchsorted(b, pts, side="right") / len(b)
    return float(np.abs(fa - fb).max())


def test_ks_matches_reference(spark):
    from pyg_timeseries_spark.functions.drift import ks_drift

    rng = np.random.default_rng(71)
    pdf = _frame(rng, n=3000, shift=0.6)
    # force duplicate values to exercise the tie handling
    pdf["v"] = pdf["v"].round(1)
    got = ks_drift(
        spark.createDataFrame(pdf),
        F.col("period") == "ref", F.col("period") == "cur",
        key="key", v="v",
    ).first()
    exp = _ref_ks(
        pdf[pdf.period == "ref"]["v"], pdf[pdf.period == "cur"]["v"]
    )
    assert abs(got["ks"] - exp) < 1e-12
    assert got["n_ref"] == 1500 and got["n_cur"] == 1500


def test_ks_orders_by_shift(spark):
    from pyg_timeseries_spark.functions.drift import ks_drift

    rng = np.random.default_rng(72)
    vals = {}
    for shift in (0.0, 0.5, 2.0):
        pdf = _frame(rng, shift=shift)
        got = ks_drift(
            spark.createDataFrame(pdf),
            F.col("period") == "ref", F.col("period") == "cur",
            key="key", v="v",
        ).first()
        vals[shift] = got["ks"]
    assert vals[0.0] < vals[0.5] < vals[2.0]
    assert vals[0.0] < 0.08 and vals[2.0] > 0.5
