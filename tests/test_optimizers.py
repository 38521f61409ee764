"""Optimizer kernels: verification is solver-independent — the reference's
own objective / optimality conditions evaluated on the returned solution."""

import numpy as np
import pytest

from pyg_timeseries_spark.kernels import opt_numpy as OPT
from pyg_timeseries_spark.operators.optimizers import (
    least_squares as ls_spark,
    maxdiv as maxdiv_spark,
    minimize_tracking_error as mte_spark,
    minimize_tracking_error_ as mte_spark_,
    riskparity as riskparity_spark,
)


def _cov(n, seed):
    rng = np.random.default_rng(seed)
    L = rng.normal(0, 1, (n, n))
    c = L @ L.T + n * np.eye(n) * 0.1
    return c


# ---- least_squares -----------------------------------------------------------

def test_least_squares_matches_normal_equations():
    rng = np.random.default_rng(0)
    A = rng.normal(0, 1, (40, 5))
    x_true = rng.normal(0, 1, 5)
    b = A @ x_true + rng.normal(0, 0.01, 40)
    b[rng.random(40) < 0.2] = np.nan
    A[rng.random((40, 5)) < 0.05] = np.nan
    x = OPT.least_squares(A, b)
    mask = ~np.isnan(b)
    AA = np.nan_to_num(A[mask])
    bb = b[mask]
    x_ne = np.linalg.solve(AA.T @ AA, AA.T @ bb)
    assert np.allclose(x, x_ne, atol=1e-8)


def test_least_squares_flattened_input():
    rng = np.random.default_rng(1)
    A = rng.normal(0, 1, (30, 4))
    b = rng.normal(0, 1, 30)
    assert np.allclose(OPT.least_squares(A.ravel(), b), OPT.least_squares(A, b))


# ---- riskparity --------------------------------------------------------------

def _risk_budget_error(weights, covariances, budget):
    """The reference's scipy objective (_riskparity.py:45-57), verbatim
    semantics: n²·Σ(contribution/total − budget)²."""
    n = covariances.shape[0] ** 2
    w = weights
    grad = covariances @ w
    contrib = w * grad
    total = contrib.sum()
    return n * np.sum((contrib / total - budget) ** 2)


@pytest.mark.parametrize("n,seed", [(3, 2), (8, 3), (20, 4)])
def test_riskparity_zeroes_reference_objective(n, seed):
    c = _cov(n, seed)
    w = OPT.riskparity(c)
    assert abs(w.sum() - 1.0) < 1e-9
    assert (w > 0).all()
    assert _risk_budget_error(w, c, np.full(n, 1.0 / n)) < 1e-16


def test_riskparity_custom_budget_and_masking():
    c = _cov(6, 5)
    budget = np.array([0.4, 0.3, 0.1, 0.1, 0.1, 0.0])  # asset 5 excluded
    c[3, 3] = np.nan  # asset 3 excluded (nan variance)
    w = OPT.riskparity(c, budget)
    assert np.isnan(w[3]) and np.isnan(w[5])
    ok = [0, 1, 2, 4]
    ww = w[ok]
    cc = c[np.ix_(ok, ok)]
    bb = budget[ok] / budget[ok].sum()
    assert abs(ww.sum() - 1.0) < 1e-9
    contrib = ww * (cc @ ww)
    assert np.allclose(contrib / contrib.sum(), bb, atol=1e-8)


# ---- maxdiv ------------------------------------------------------------------

def _feasible(n, lo, hi, rng):
    for _ in range(1000):
        w = rng.dirichlet(np.ones(n))
        w = lo + w * (hi - lo)
        w = w / w.sum() if abs(w.sum()) > 1e-12 else w
        if (w >= lo - 1e-9).all() and (w <= hi + 1e-9).all() and abs(w.sum() - 1) < 1e-9:
            yield w


def test_maxdiv_unconstrained_closed_form():
    c = _cov(5, 6)
    w = OPT.maxdiv(c)
    # argmin w'Cw s.t. Σw=1 has the closed form C⁻¹1/(1'C⁻¹1)
    exp = np.linalg.solve(c, np.ones(5))
    exp = exp / exp.sum()
    assert np.allclose(w, exp, atol=1e-6)


def test_maxdiv_box_constrained_beats_random_feasible():
    rng = np.random.default_rng(7)
    n = 6
    c = _cov(n, 8)
    lo = np.full(n, 0.05)
    hi = np.full(n, 0.3)
    w = OPT.maxdiv(c, lo, hi)
    assert abs(w.sum() - 1.0) < 1e-8
    assert (w >= lo - 1e-9).all() and (w <= hi + 1e-9).all()
    obj = w @ c @ w
    count = 0
    for r in _feasible(n, lo, hi, rng):
        assert obj <= r @ c @ r + 1e-9
        count += 1
        if count >= 200:
            break
    assert count >= 50


def test_maxdiv_nan_column_masked():
    # missing-asset detection follows the reference: NaNs in the FIRST row
    # mark missing columns (_maxdiv.py:31)
    c = _cov(4, 9)
    c[2, :] = c[:, 2] = np.nan
    w = OPT.maxdiv(c)
    assert w[2] == 0.0
    assert abs(w.sum() - 1.0) < 1e-8


# ---- tracking error ----------------------------------------------------------

def test_int_nearest_target_reference_vectors():
    # golden vectors from the reference docstring (_track.py:27-41)
    target = np.array([0.2, 0.2, 0.2])
    init = np.array([3.0, 0.0, -3.0])
    assert OPT.int_nearest_target(target, init).tolist() == [1.0, 0.0, 0.0]
    assert OPT.int_nearest_target(target).tolist() == [0.0, 0.0, 0.0]


def test_tracking_error_step_invariants():
    rng = np.random.default_rng(10)
    n = 8
    c = _cov(n, 11)
    target = rng.normal(0, 5, n)
    pos, err = OPT.minimize_tracking_error_step(c, target)
    # integer positions
    assert np.allclose(pos, np.round(pos))
    # never worse than the plain unit-rounded start
    d0 = target - OPT.int_nearest_target(target)
    assert err <= d0 @ c @ d0 + 1e-9
    # moves only toward the target: |target - pos| <= |target - rounded|
    assert (np.abs(target - pos) <= np.abs(d0) + 1e-9).all()


def test_tracking_error_sweep_state_split():
    rng = np.random.default_rng(12)
    T, n = 40, 5
    c = _cov(n, 13)
    targets = rng.normal(0, 4, (T, n)).cumsum(axis=0) * 0.3
    full_pos, full_err, full_s = OPT.minimize_tracking_error_sweep(c, targets)
    h_pos, h_err, s = OPT.minimize_tracking_error_sweep(c, targets[:17])
    t_pos, t_err, s2 = OPT.minimize_tracking_error_sweep(c, targets[17:], state=s)
    assert np.array_equal(np.vstack([h_pos, t_pos]), full_pos)
    assert np.array_equal(np.concatenate([h_err, t_err]), full_err)
    assert np.array_equal(s2, full_s)


# ---- Spark wrappers ----------------------------------------------------------

def _melt_cov(spark, c, ts_values, key_prefix="a"):
    import pandas as pd

    rows = []
    n = c.shape[0]
    for t in ts_values:
        for i in range(n):
            for j in range(i, n):
                rows.append((t, f"{key_prefix}{i}", f"{key_prefix}{j}", float(c[i, j])))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "key_i", "key_j", "cov"]))


def test_spark_riskparity_per_date(spark):
    import pandas as pd

    c = _cov(4, 20)
    ts_values = pd.date_range("2024-01-01", periods=3, freq="1D")
    cov = _melt_cov(spark, c, ts_values)
    out = riskparity_spark(cov).toPandas().sort_values(["ts", "key"])
    assert len(out) == 12
    exp = OPT.riskparity(c)
    for _, grp in out.groupby("ts"):
        got = grp.sort_values("key")["weight"].to_numpy(float)
        assert np.allclose(got, exp, atol=1e-9)


def test_spark_riskparity_budget_broadcast_join(spark):
    """The distributed-budget path (broadcast join + per-cogroup budget
    reconstruction, no driver collect): must equal the kernel called with
    the same budget vector, including the missing-key → 0-budget → NaN
    masking."""
    import pandas as pd

    c = _cov(4, 23)
    ts_values = pd.date_range("2024-01-01", periods=2, freq="1D")
    cov = _melt_cov(spark, c, ts_values)
    # a3 intentionally ABSENT from the budget table → budget 0 → masked
    budget = spark.createDataFrame(
        pd.DataFrame({"key": ["a0", "a1", "a2"], "budget": [0.5, 0.3, 0.2]})
    )
    out = riskparity_spark(cov, budget=budget).toPandas().sort_values(
        ["ts", "key"])
    exp = OPT.riskparity(c, np.array([0.5, 0.3, 0.2, 0.0]))
    assert np.isnan(exp[3])
    for _, grp in out.groupby("ts"):
        got = grp.sort_values("key")["weight"].to_numpy(float)
        assert np.allclose(got, exp, atol=1e-9, equal_nan=True)


def test_spark_maxdiv_per_date(spark):
    import pandas as pd

    rng = np.random.default_rng(22)
    c = _cov(4, 21)
    d = np.sqrt(np.diag(c))
    cor = c / np.outer(d, d)
    cov = _melt_cov(spark, cor, pd.date_range("2024-01-01", periods=2))
    out = maxdiv_spark(cov.withColumnRenamed("cov", "cor")).toPandas()
    exp = OPT.maxdiv(cor)
    for _, grp in out.groupby("ts"):
        got = grp.sort_values("key")["weight"].to_numpy(float)
        assert np.allclose(got, exp, atol=1e-8)


def test_spark_least_squares_rows(spark):
    import pandas as pd

    rng = np.random.default_rng(23)
    rows = []
    for i in range(6):
        A = rng.normal(0, 1, (12, 3))
        b = rng.normal(0, 1, 12)
        rows.append((f"k{i}", pd.Timestamp("2024-01-01"),
                     [float(x) for x in A.ravel()], [float(x) for x in b]))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "ts", "A", "b"]))
    out = ls_spark(df).toPandas().sort_values("key").reset_index(drop=True)
    for i in range(6):
        A = np.asarray(rows[i][2]).reshape(12, 3)
        b = np.asarray(rows[i][3])
        exp = OPT.least_squares(A, b)
        assert np.allclose(np.asarray(out["x"][i]), exp, atol=1e-9)


def test_spark_tracking_error_state_split(spark):
    import pandas as pd

    rng = np.random.default_rng(24)
    c = _cov(3, 25)
    T_, n = 30, 3
    targets = rng.normal(0, 4, (T_, n)).cumsum(axis=0) * 0.3
    times = pd.date_range("2024-01-01", periods=T_)
    rows = [("p1", times[i], f"a{j}", float(targets[i, j]))
            for i in range(T_) for j in range(n)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["pf", "ts", "asset", "target"]))
    crows = [("p1", f"a{i}", f"a{j}", float(c[i, j]))
             for i in range(n) for j in range(i, n)]
    cov = spark.createDataFrame(
        pd.DataFrame(crows, columns=["pf", "key_i", "key_j", "cov"]))

    full = mte_spark(df, cov).toPandas().sort_values(["ts", "asset"])
    exp_pos, exp_err, _ = OPT.minimize_tracking_error_sweep(c, targets)
    got = full.pivot(index="ts", columns="asset", values="pos").to_numpy()
    assert np.array_equal(got, exp_pos)

    from pyspark.sql import functions as F

    cut = F.lit(str(times[13])).cast("timestamp")
    _, st = mte_spark_(df.filter(F.col("ts") < cut), cov)
    resumed = mte_spark(df.filter(F.col("ts") >= cut), cov, state_df=st).toPandas()
    r = resumed.sort_values(["ts", "asset"])
    f = full[full.ts >= r.ts.min()]
    assert np.array_equal(r["pos"].to_numpy(), f["pos"].to_numpy())
