"""Multi-asset risk-targeted buffering — fresh NumPy implementation of the
reference's multibuffer semantics (/root/reference/src/pyg_timeseries/
_multibuffer.py: bisect :9-45, _single_step_multibuffer :48-146,
_multibuffer :218-258).

Per timestep the portfolio holds integer (unit-rounded) positions; the
fractional targets are scaled by a multiplier m so the realized buffered
positions' risk  sqrt(posᵀ·(corr∘(pv·vol)(pv·vol)ᵀ)·pos)  stays within
[1-risk_band, 1+risk_band] of the target risk.  m is found by a
sign-snapping bisection (5 iterations, snapping toward the previous m to
avoid churn), and each candidate m is evaluated through ONE buffer step per
asset (hysteresis band + unit rounding) starting from the previous
positions.

Sequential in time ON PURPOSE (like every kernel here): resume from
state = [m, pos_0..pos_{k-1}] is bit-identical to a full sweep.
"""

from __future__ import annotations

import numpy as np


def bisect(f, lb, ub, n=0, aim=np.nan):
    """Bisection that supports discontinuous step functions and snaps the
    answer toward ``aim`` when f is flat there (reference bisect,
    _multibuffer.py:9-45)."""
    flb = f(lb)
    fub = f(ub)
    for _ in range(n or 10):
        if fub * flb >= 0:
            break
        mid = (lb + ub) / 2
        fmid = f(mid)
        if flb * fmid < 0:
            ub = mid
            fub = fmid
        else:
            lb = mid
            flb = fmid
    mid = (lb + ub) / 2
    if np.isnan(aim):
        return mid
    if f(aim) == f(mid):
        return aim
    return lb if aim < mid else ub


def _c_round(x):
    """Half-away-from-zero rounding (C round), vectorized — python round()
    is banker's and diverges on .5 edges."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def buffer_step(prev_pos, targets, band, unit=1.0, rounding_band=0.0):
    """One hysteresis-buffer step for the whole asset vector: hold the
    previous position while it stays inside [t-band, t+band] (unit-rounded
    edges); NaN targets hold the previous position."""
    t = np.asarray(targets, float)
    b = np.broadcast_to(np.asarray(band, float), t.shape)
    b = np.where(np.isnan(b), 0.0, b)
    if unit:
        b_in_unit = np.maximum(b / unit, rounding_band)
        a_in_unit = t / unit
        lb = _c_round(a_in_unit - b_in_unit) * unit
        ub = _c_round(a_in_unit + b_in_unit) * unit
    else:
        lb = t - b
        ub = t + b
    pos = np.clip(prev_pos, lb, ub)
    return np.where(np.isnan(t), prev_pos, pos)


def _risk(cw, pos):
    """sqrt(posᵀ·cw·pos) with NaN positions treated as 0 (the reference
    zeroes NaN targets before the step)."""
    p = np.where(np.isnan(pos), 0.0, np.asarray(pos, float))
    return float(np.sqrt(max(p @ cw @ p, 0.0)))


def single_step_multibuffer(target, position_target, band, point_values, vol,
                            correlations, previous, unit=1.0, prev_m=1.0,
                            risk_band=0.1, rounding_band=0.0):
    """One timestep: returns (m, buffered_positions, mismatch).

    Reference _single_step_multibuffer (_multibuffer.py:48-146): if the
    buffered risk at the previous multiplier leaves the band, bisect m over
    [prev_m, prev_m ± risk_band] toward the NEAR edge of the band, and fall
    back to prev_m when the correction overshoots the other edge."""
    pv = np.where(np.isnan(point_values * vol), 0.0, point_values * vol)
    cw = correlations * np.outer(pv, pv)
    cw = np.where(np.isnan(cw), 0.0, cw)
    target = np.where(np.isnan(target), 0.0, np.asarray(target, float))
    position_target = np.where(
        np.isnan(position_target), 0.0, np.asarray(position_target, float)
    )
    target_risk = _risk(cw, target)

    def mismatch_of(pos, target_mismatch=1.0):
        if target_risk == 0:
            return 0.0
        return _risk(cw, pos) / target_risk - target_mismatch

    def step(m):
        return buffer_step(previous, position_target * m, band, unit, rounding_band)

    m = prev_m
    pos = step(m)
    mis = mismatch_of(pos)
    if mis < -risk_band:
        m = bisect(lambda x: mismatch_of(step(x), 1 - risk_band),
                   lb=prev_m, ub=prev_m + risk_band, n=5, aim=prev_m)
        pos = step(m)
        if mismatch_of(pos) > risk_band:
            m = prev_m
            pos = step(m)
    elif mis > risk_band:
        m = bisect(lambda x: mismatch_of(step(x), 1 + risk_band),
                   lb=prev_m - risk_band, ub=prev_m, n=5, aim=prev_m)
        pos = step(m)
        if mismatch_of(pos) < -risk_band:
            m = prev_m
            pos = step(m)
    return m, pos, mismatch_of(pos)


def multibuffer_sweep(target, band, vol, point_values, correlations,
                      position_target=None, unit=1.0, risk_band=0.1,
                      rounding_band=0.0, state=None):
    """Full sweep over a (T, k) target panel.

    ``correlations``: (k, k) constant or (T, k, k).  ``band``/``vol``/
    ``point_values``: (T, k) panels (broadcastable).  ``state``:
    [m, pos_0..pos_{k-1}] or None.  Returns (positions (T,k), mult (T,),
    mismatch (T,), state_out)."""
    target = np.asarray(target, float)
    T, k = target.shape
    if position_target is None:
        position_target = target
    band = np.broadcast_to(np.asarray(band, float), target.shape)
    vol = np.broadcast_to(np.asarray(vol, float), target.shape)
    point_values = np.broadcast_to(np.asarray(point_values, float), target.shape)
    corr = np.asarray(correlations, float)
    const_corr = corr.ndim == 2
    if state is None:
        m = 1.0
        prev = np.zeros(k)
    else:
        s = np.asarray(state, float)
        m = float(s[0])
        prev = s[1:k + 1].copy()
    positions = np.zeros((T, k))
    mult = np.ones(T)
    mismatch = np.zeros(T)
    for i in range(T):
        m, prev, mis = single_step_multibuffer(
            target=target[i], position_target=position_target[i],
            band=band[i], point_values=point_values[i], vol=vol[i],
            correlations=corr if const_corr else corr[i],
            previous=prev, unit=unit, prev_m=m, risk_band=risk_band,
            rounding_band=rounding_band,
        )
        positions[i] = prev
        mult[i] = m
        mismatch[i] = mis
    return positions, mult, mismatch, np.concatenate([[m], prev])


def near_correlation_matrix(near_correlation: float, n: int) -> np.ndarray:
    """corr decaying as |i-j| grows (reference _multibuffer.py:180-194)."""
    idx = np.arange(n)
    return near_correlation ** np.abs(idx[:, None] - idx[None, :])


def beta_correlation_matrix(beta, n: int | None = None) -> np.ndarray:
    """Single-factor correlation from per-asset betas (reference
    _multibuffer.py:196-214)."""
    if np.isscalar(beta):
        beta = np.full(n, float(beta))
    beta = np.asarray(beta, float)
    c = np.outer(beta, beta)
    np.fill_diagonal(c, 1.0)
    return c
