"""Two-heap rolling quantile: pandas parity (incl. min_periods ramp and
interpolation), state-split, and hypothesis fuzz vs a brute-force oracle."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from pyg_timeseries_spark.kernels.quantile_numpy import rolling_quantile_heap


def brute(a, n, q, min_periods):
    vals = []
    out = np.full(len(a), np.nan)
    for i, v in enumerate(a):
        if v != v:
            continue
        vals.append(v)
        win = vals[-n:]
        if len(win) >= min_periods:
            out[i] = np.quantile(win, q, method="linear")
    return out


def test_matches_pandas_ramp():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 500)
    for n, mp, q in [(10, 10, 0.25), (10, 1, 0.5), (50, 25, 0.9), (7, 3, 0.05)]:
        got, _ = rolling_quantile_heap(a, n, q, min_periods=mp)
        exp = (
            pd.Series(a).rolling(n, min_periods=mp).quantile(q, interpolation="linear")
        ).to_numpy()
        # bit-exact vs np.quantile (the reference's pin); pandas' rolling
        # quantile interpolates with its own code, 1 ULP off numpy's lerp
        assert np.allclose(got, exp, atol=1e-13, rtol=0, equal_nan=True), (n, mp, q)


def test_nan_skip():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 1, 300)
    a[rng.random(300) < 0.3] = np.nan
    got, _ = rolling_quantile_heap(a, 10, 0.5, min_periods=5)
    exp = brute(a, 10, 0.5, 5)
    assert np.array_equal(got, exp, equal_nan=True)


def test_state_split():
    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, 400)
    a[rng.random(400) < 0.2] = np.nan
    full, _ = rolling_quantile_heap(a, 20, 0.75)
    head, s = rolling_quantile_heap(a[:150], 20, 0.75)
    tail, _ = rolling_quantile_heap(a[150:], 20, 0.75, state=s)
    assert np.array_equal(np.concatenate([head, tail]), full, equal_nan=True)


@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
             min_size=1, max_size=200),
    st.integers(min_value=2, max_value=30),
    st.floats(min_value=0.0, max_value=1.0),
)
@settings(max_examples=80, deadline=None)
def test_fuzz_vs_brute(vals, n, q):
    a = np.array(vals)
    got, _ = rolling_quantile_heap(a, n, q, min_periods=1)
    exp = brute(a, n, q, 1)
    assert np.allclose(got, exp, atol=1e-9, equal_nan=True)


def test_spark_wrapper(spark, series_df):
    from pyg_timeseries_spark.operators.rolling import (
        rolling_quantile, rolling_quantile_heap as spark_heap,
    )

    jvm = rolling_quantile(series_df, 10, 0.25, out="q1").toPandas()
    heap = spark_heap(series_df, 10, 0.25, out="q2").toPandas()
    m = jvm.merge(heap[["key", "ts", "q2"]], on=["key", "ts"])
    g, e = m["q1"].to_numpy(float), m["q2"].to_numpy(float)
    assert (np.isnan(g) == np.isnan(e)).all()
    both = ~np.isnan(g)
    assert np.abs(g[both] - e[both]).max() < 1e-9
