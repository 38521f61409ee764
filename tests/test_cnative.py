"""Bit-parity of the ctypes-compiled C kernels (kernels/cnative.py) with
the pure-Python loops, over NaN-laced inputs with clocks, weights, zeros,
and resume states.  Skipped when no system compiler is present (the
dispatchers then keep the Python path)."""

import numpy as np
import pytest

from pyg_timeseries_spark.kernels import cnative
from pyg_timeseries_spark.kernels import ewm_numpy as EW
from pyg_timeseries_spark.kernels import pairwise_numpy as PK
from pyg_timeseries_spark.kernels import recurrence_numpy as RK

pytestmark = pytest.mark.skipif(
    not cnative.available(), reason="no C compiler on this host"
)


def _series(n=600, seed=0, nan_frac=0.25, with_zeros=False, scale=1.0):
    rng = np.random.default_rng(seed)
    a = rng.normal(0, scale, n)
    a[rng.random(n) < nan_frac] = np.nan
    if with_zeros:
        a[rng.random(n) < 0.1] = 0.0
    return a


def _clock(n, seed=1):
    rng = np.random.default_rng(seed)
    t = np.cumsum(rng.integers(0, 3, n)).astype(float)
    t[rng.random(n) < 0.05] = np.nan
    return t


def _eq(x, y):
    return np.array_equal(x, y, equal_nan=True)


@pytest.mark.parametrize("upto,track_w2", [(1, False), (2, True), (3, True),
                                           (3, False)])
@pytest.mark.parametrize("with_time,with_wgt", [(False, False), (True, False),
                                                (True, True), (False, True)])
def test_ewm_sweep_c_parity(upto, track_w2, with_time, with_wgt):
    a = _series(seed=2)
    time = _clock(len(a)) if with_time else None
    wgt = np.abs(_series(seed=3, nan_frac=0.0)) + 0.1 if with_wgt else None
    w = 10 / 11
    with cnative.disabled():
        trail_py, s_py = EW._ewm_sweep(a, w, time=time, wgt=wgt, upto=upto,
                                       track_w2=track_w2)
    trail_c, s_c = EW._ewm_sweep(a, w, time=time, wgt=wgt, upto=upto,
                                 track_w2=track_w2)
    assert _eq(trail_py, trail_c) and _eq(s_py, s_c)


def test_ewm_sweep_c_resume_state():
    a = _series(seed=4)
    w = 20 / 21
    with cnative.disabled():
        _, s_head = EW._ewm_sweep(a[:300], w, upto=3, track_w2=True)
        trail_py, s_py = EW._ewm_sweep(a[300:], w, state=s_head.copy(),
                                       upto=3, track_w2=True)
    trail_c, s_c = EW._ewm_sweep(a[300:], w, state=s_head.copy(), upto=3,
                                 track_w2=True)
    assert _eq(trail_py, trail_c) and _eq(s_py, s_c)


@pytest.mark.parametrize("mode,bias", [("rms", False), ("std", False),
                                       ("std", True)])
@pytest.mark.parametrize("exc_zero,max_move", [(False, 3.0), (True, None),
                                               (True, 2.0)])
@pytest.mark.parametrize("with_time", [False, True])
def test_guarded_c_parity(mode, bias, exc_zero, max_move, with_time):
    a = _series(seed=10, with_zeros=True)
    time = _clock(len(a), seed=11) if with_time else None
    args = (a, 10, time, None, None, exc_zero, max_move, 3, 0.25, mode)
    with cnative.disabled():
        res_py, s_py = EW._guarded_sweep(*args, bias=bias)
    res_c, s_c = EW._guarded_sweep(*args, bias=bias)
    assert _eq(res_py, res_c) and _eq(s_py, s_c)


@pytest.mark.parametrize("with_time", [False, True])
def test_xsweep_c_parity(with_time):
    a, b = _series(seed=12), _series(seed=13)
    time = _clock(len(a), seed=14) if with_time else None
    w = 10 / 11
    with cnative.disabled():
        trail_py, s_py = PK._xsweep(a, b, w, time=time)
    trail_c, s_c = PK._xsweep(a, b, w, time=time)
    assert _eq(trail_py, trail_c) and _eq(s_py, s_c)


@pytest.mark.parametrize("exc_zero", [False, True])
def test_zmooth_c_parity(exc_zero):
    a = _series(seed=15, nan_frac=0.1, with_zeros=True) * 3
    smooth = _series(seed=16, nan_frac=0.3)
    with cnative.disabled():
        res_py, s_py = RK.zmooth(a, 10, smooth=smooth, max_move=2.0,
                                 exc_zero=exc_zero)
    res_c, s_c = RK.zmooth(a, 10, smooth=smooth, max_move=2.0,
                           exc_zero=exc_zero)
    assert _eq(res_py, res_c) and _eq(s_py, s_c)


@pytest.mark.parametrize("unit,rounding", [(0.0, 0.0), (1.0, 0.0), (0.5, 0.3)])
def test_buffer_c_parity(unit, rounding):
    a = _series(seed=17, nan_frac=0.1) * 5
    band = np.abs(_series(seed=18, nan_frac=0.2))
    state = np.array([0.7, 0.2])
    with cnative.disabled():
        res_py, s_py = RK.buffer(a, band, unit=unit, rounding_band=rounding,
                                 state=state.copy())
    res_c, s_c = RK.buffer(a, band, unit=unit, rounding_band=rounding,
                           state=state.copy())
    assert _eq(res_py, res_c) and _eq(s_py, s_c)


def test_noncontiguous_inputs():
    """Strided views must not silently corrupt the C path."""
    big = _series(1200, seed=19)
    a = big[::2]  # non-contiguous
    with cnative.disabled():
        trail_py, s_py = EW._ewm_sweep(a, 0.9, upto=2, track_w2=True)
    trail_c, s_c = EW._ewm_sweep(a, 0.9, upto=2, track_w2=True)
    assert _eq(trail_py, trail_c) and _eq(s_py, s_c)


@pytest.mark.parametrize("q,r", [(0.04, 1.0), (0.0, 0.5), (2.5, 0.1)])
def test_kalman_c_parity(q, r):
    from pyg_timeseries_spark.operators.kalman import kalman_kernel

    a = _series(seed=7)
    with cnative.disabled():
        res_py, s_py = kalman_kernel(a, q, r)
    res_c, s_c = kalman_kernel(a, q, r)
    assert _eq(res_py, res_c) and _eq(s_py, s_c)


def test_kalman_c_resume_state():
    from pyg_timeseries_spark.operators.kalman import kalman_kernel

    a = _series(seed=8)
    with cnative.disabled():
        _, s_head_py = kalman_kernel(a[:300], 0.04, 1.0)
        res_tail_py, s_py = kalman_kernel(a[300:], 0.04, 1.0, state=s_head_py)
    _, s_head_c = kalman_kernel(a[:300], 0.04, 1.0)
    assert _eq(s_head_py, s_head_c)
    res_tail_c, s_c = kalman_kernel(a[300:], 0.04, 1.0, state=s_head_c)
    assert _eq(res_tail_py, res_tail_c) and _eq(s_py, s_c)


@pytest.mark.parametrize("alpha,beta,horizon", [(0.4, 0.2, 0.0),
                                                (0.9, 0.0, 2.0)])
def test_holt_c_parity(alpha, beta, horizon):
    from pyg_timeseries_spark.operators.holt import holt_kernel

    a = _series(seed=9)
    with cnative.disabled():
        res_py, s_py = holt_kernel(a, alpha, beta, horizon)
    res_c, s_c = holt_kernel(a, alpha, beta, horizon)
    assert _eq(res_py, res_c) and _eq(s_py, s_c)
    # resume parity
    with cnative.disabled():
        _, sh = holt_kernel(a[:300], alpha, beta, horizon)
        rt_py, sf_py = holt_kernel(a[300:], alpha, beta, horizon, state=sh)
    _, sh_c = holt_kernel(a[:300], alpha, beta, horizon)
    rt_c, sf_c = holt_kernel(a[300:], alpha, beta, horizon, state=sh_c)
    assert _eq(sh, sh_c) and _eq(rt_py, rt_c) and _eq(sf_py, sf_c)


@pytest.mark.parametrize("m", [2, 7])
def test_hw_c_parity(m):
    from pyg_timeseries_spark.operators.holt import holt_winters_kernel

    a = _series(seed=10, nan_frac=0.2)
    args = (0.3, 0.1, 0.2, m)
    with cnative.disabled():
        res_py, s_py = holt_winters_kernel(a, *args)
    res_c, s_c = holt_winters_kernel(a, *args)
    assert _eq(res_py, res_c) and _eq(s_py, s_c)
    with cnative.disabled():
        _, sh = holt_winters_kernel(a[:150], *args)
        rt_py, sf_py = holt_winters_kernel(a[150:], *args, state=sh)
    _, sh_c = holt_winters_kernel(a[:150], *args)
    rt_c, sf_c = holt_winters_kernel(a[150:], *args, state=sh_c)
    assert _eq(sh, sh_c) and _eq(rt_py, rt_c) and _eq(sf_py, sf_c)
