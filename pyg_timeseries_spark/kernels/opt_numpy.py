"""Per-date portfolio optimizers — plain-NumPy implementations of the
reference modules that used scipy/cvxpy (unavailable in this image):

  least_squares            /root/reference/src/pyg_timeseries/_opt.py:4-70
                           (cvxpy sum_squares == ordinary least squares)
  riskparity               _riskparity.py:10-157 (scipy minimize of the
                           risk-budget error; here the cyclical coordinate
                           descent fixed point, whose solution zeroes that
                           same objective exactly)
  maxdiv                   _maxdiv.py:21-103 (SLSQP min w'Cw s.t. Σw=1 +
                           box; here an exact active-set equality QP)
  minimize_tracking_error  _track.py:49-198 (already scipy-free in the
                           reference: greedy integer descent — fresh
                           rendition of those semantics)

Each solves ONE date; dates are independent (embarrassingly parallel in
Spark) except tracking error, which carries the integer position forward.
Verification is solver-independent: tests check the REFERENCE's objective /
KKT conditions on the returned solution, not a solver trajectory.
"""

from __future__ import annotations

import numpy as np


def least_squares(A: np.ndarray, b: np.ndarray) -> np.ndarray:
    """argmin_x ||Ax − b||₂.  NaNs in b drop the row (of both); NaNs in A
    become 0 (reference _opt.py:60-63).  A may arrive flattened (m·n,)."""
    b = np.asarray(b, float)
    m = b.shape[0]
    A = np.asarray(A, float)
    if A.ndim == 1:
        A = A.reshape(m, A.shape[0] // m)
    mask = ~np.isnan(b)
    bb = b[mask]
    AA = A[mask].copy()
    AA[np.isnan(AA)] = 0.0
    if bb.shape[0] == 0:
        return np.full(A.shape[1], np.nan)
    x, *_ = np.linalg.lstsq(AA, bb, rcond=None)
    return x


def _mask_cov(c: np.ndarray, budget: np.ndarray):
    d = np.diagonal(c)
    ok = ~(np.isnan(d) | (d <= 0) | (budget == 0))
    return ok


def riskparity(covariances: np.ndarray, assets_risk_budget=None,
               weights=None, tol: float = 1e-12, max_iter: int = 10_000
               ) -> np.ndarray:
    """Risk-budget weights: w ≥ 0, Σw = 1, and asset i's risk contribution
    w_i·(Cw)_i / (w'Cw) equals budget_i — the exact zero of the reference's
    scipy objective (_riskparity.py:45-57).  Solved by cyclical coordinate
    descent (Spinu 2013; Griveau-Billion et al. 2013): per coordinate the
    first-order condition is a quadratic with the positive root

        x_i ← (−B_i + sqrt(B_i² + 4·C_ii·b_i·σ(x))) / (2·C_ii),
        B_i = (Cx)_i − x_i·C_ii,  σ(x) = sqrt(x'Cx)

    then normalize.  Assets with NaN/zero variance or zero budget get NaN
    (reference masking, _riskparity.py:92-99)."""
    c = np.asarray(covariances, float)
    n = c.shape[0]
    b = (np.full(n, 1.0 / n) if assets_risk_budget is None
         else np.nan_to_num(np.asarray(assets_risk_budget, float)))
    ok = _mask_cov(c, b)
    fit = np.full(n, np.nan)
    k = int(ok.sum())
    if k == 0:
        return fit
    C = c[np.ix_(ok, ok)].copy()
    C[np.isnan(C)] = 0.0
    bb = b[ok] / b[ok].sum()
    x = (np.ones(k) / k if weights is None or np.isnan(weights[ok]).any()
         else np.clip(weights[ok], 1e-12, None))
    x = x / x.sum()
    for _ in range(max_iter):
        x_old = x.copy()
        cx = C @ x
        sigma = np.sqrt(max(x @ cx, 1e-300))
        for i in range(k):
            Bi = cx[i] - x[i] * C[i, i]
            xi = (-Bi + np.sqrt(Bi * Bi + 4.0 * C[i, i] * bb[i] * sigma)) / (
                2.0 * C[i, i]
            )
            delta = xi - x[i]
            if delta != 0.0:
                cx = cx + C[:, i] * delta
                x[i] = xi
                sigma = np.sqrt(max(x @ cx, 1e-300))
        if np.abs(x - x_old).max() < tol * max(1.0, np.abs(x).max()):
            break
    fit[ok] = x / x.sum()
    return fit


def maxdiv(c: np.ndarray, min_weights=None, max_weights=None, weights=None,
           max_iter: int = 200) -> np.ndarray:
    """Max-diversification weights: argmin w'Cw s.t. Σw = 1 and
    min ≤ w ≤ max (the reference's SLSQP problem, _maxdiv.py:21-66), solved
    by an exact active-set method: on the free set the equality-constrained
    QP has the closed form w = C⁻¹1 / (1'C⁻¹1) (shifted for clamped mass);
    bound violations clamp and re-solve.  Assets with NaN correlation row
    get weight 0 (reference masks on the first row)."""
    c = np.asarray(c, float)
    t = c.shape[0]
    bad = np.isnan(c[0])
    good = ~bad
    k = int(good.sum())
    rtn = np.zeros(t)
    if k == 0:
        return rtn
    if k == 1:
        rtn[good] = 1.0
        return rtn
    C = c[np.ix_(good, good)].copy()
    C[np.isnan(C)] = 0.0
    # regularize for the solve only (SLSQP tolerates singular C; inv needs help)
    C = C + 1e-10 * np.eye(k)
    lo = (np.full(k, -np.inf) if min_weights is None
          else np.asarray(min_weights, float)[good])
    hi = (np.full(k, np.inf) if max_weights is None
          else np.asarray(max_weights, float)[good])
    w = np.clip(np.full(k, 1.0 / k), lo, hi)
    clamped = np.zeros(k, dtype=bool)
    for _ in range(max_iter):
        free = ~clamped
        budget = 1.0 - w[clamped].sum()
        Cf = C[np.ix_(free, free)]
        rhs_cross = (C[np.ix_(free, clamped)] @ w[clamped]
                     if clamped.any() else np.zeros(free.sum()))
        # minimize u'Cf u + 2 u'rhs_cross  s.t. Σu = budget:
        # u = Cf⁻¹(λ·1 − rhs_cross), λ from the budget constraint
        try:
            Cf_inv_1 = np.linalg.solve(Cf, np.ones(free.sum()))
            Cf_inv_r = np.linalg.solve(Cf, rhs_cross)
        except np.linalg.LinAlgError:
            break
        lam = (budget + Cf_inv_r.sum()) / Cf_inv_1.sum()
        u = lam * Cf_inv_1 - Cf_inv_r
        w_new = w.copy()
        w_new[free] = u
        viol_lo = free & (w_new < lo - 1e-12)
        viol_hi = free & (w_new > hi + 1e-12)
        if not (viol_lo.any() or viol_hi.any()):
            w = w_new
            # KKT release check: a clamped weight stays clamped only if
            # releasing it would not decrease the objective
            if clamped.any():
                g = 2.0 * (C @ w)
                free_g = g[free]
                lam_dual = free_g.mean() if free.any() else 0.0
                release = clamped & (
                    ((np.isclose(w, lo)) & (g < lam_dual - 1e-10))
                    | ((np.isclose(w, hi)) & (g > lam_dual + 1e-10))
                )
                if release.any():
                    clamped = clamped & ~release
                    continue
            break
        w_new[viol_lo] = lo[viol_lo]
        w_new[viol_hi] = hi[viol_hi]
        clamped = clamped | viol_lo | viol_hi
        w = w_new
        if clamped.all():
            break
    rtn[good] = w
    return rtn


def _na2v(a, v=0.0):
    out = np.asarray(a, float).copy()
    out[np.isnan(out)] = v
    return out


def int_nearest_target(target: np.ndarray, init=None) -> np.ndarray:
    """Move init toward target in whole units, never overshooting
    (reference _track.py:20-45)."""
    target = np.asarray(target, float)
    if init is None:
        init = np.zeros(target.shape)
    d = _na2v(target - init).astype(int)
    return init + d


def minimize_tracking_error_step(covariance, target, multiplier=None,
                                 position=None, min_change: float = 0.01,
                                 search: int = 2):
    """One date of integer-position tracking-error minimization: start from
    the unit-rounded position, then greedily move single units in the
    direction of the target while each move cuts the tracking error
    d'Cd by more than ``min_change`` relative (reference
    _track.py:49-109 semantics, fresh rendition).  Returns
    (positions, remaining_error)."""
    target = np.asarray(target, float)
    n = target.shape[0]
    ns = np.arange(n)
    res = int_nearest_target(target, position).astype(float)
    cov = np.asarray(covariance, float).copy()
    cov[np.isnan(cov)] = 0.0
    if multiplier is not None:
        mult = _na2v(multiplier)
        cr = cov * np.outer(mult, mult)
    else:
        cr = cov
    moved: set[int] = set()
    d = _na2v(target - res)
    gradient = cr @ d
    base = gradient @ d
    j = 0
    m = -1.0
    while m < -abs(min_change) and j < 20:
        m = 0.0
        sgn = np.sign(d)
        gbase = -2.0 * gradient * sgn
        mask = gbase < 0
        gn = sorted(zip(gbase[mask], ns[mask]))
        ok = True
        found = 0
        dbase = [0.0] * n
        for g, i in gn:
            if ok and g < 0 and i not in moved:
                r = res.copy()
                r[i] = r[i] + sgn[i]
                dd = _na2v(target - r)
                dbase[i] = m = (cr @ dd) @ dd / base - 1.0
                if m < -abs(min_change):
                    found += 1
                    if search > 0 and found >= search:
                        ok = False
        if found > 1:
            m = min(dbase)
            i = dbase.index(m)
        if m < -abs(min_change):
            moved.add(i)
            res[i] = res[i] + sgn[i]
            d = _na2v(target - res)
            gradient = cr @ d
            base = gradient @ d
            if base <= 0:
                return res, base
            j += 1
    return res, base


def minimize_tracking_error_sweep(covariances, targets, multipliers=None,
                                  min_change: float = 0.01, search: int = 2,
                                  state=None):
    """Sweep over a (T, n) target panel with (T, n, n) (or constant (n, n))
    covariances, carrying the integer position date-to-date (reference
    minimize_tracking_error's ts_iterate driver).  state = previous
    positions (n,).  Returns (positions (T, n), errors (T,), state)."""
    targets = np.asarray(targets, float)
    T, n = targets.shape
    cov = np.asarray(covariances, float)
    const_cov = cov.ndim == 2
    pos = None if state is None else np.asarray(state, float).copy()
    out = np.zeros((T, n))
    errs = np.zeros(T)
    for i in range(T):
        mult = None if multipliers is None else np.asarray(multipliers, float)[i]
        pos, err = minimize_tracking_error_step(
            cov if const_cov else cov[i], targets[i], multiplier=mult,
            position=pos, min_change=min_change, search=search,
        )
        out[i] = pos
        errs[i] = err
    return out, errs, (pos if pos is not None else np.zeros(n))
