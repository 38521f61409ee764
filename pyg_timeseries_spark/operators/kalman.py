"""Local-level Kalman filter — the probabilistic sibling of ewma.

Public model (Durbin & Koopman, *Time Series Analysis by State Space
Methods* §2; Harvey's "local level" structural model):

    state:        mu_t = mu_{t-1} + eta_t,    eta ~ N(0, q)
    observation:  x_t  = mu_t + eps_t,        eps ~ N(0, r)

Filtered recursion per valid observation (diffuse initialization: the
first valid x gives posterior level = x with variance r, the exact
P -> inf limit):

    P_pred = P + q
    K      = P_pred / (P_pred + r)
    level  = level + K * (x - level)
    P      = (1 - K) * P_pred

The gain K converges to the steady-state value, at which point the
filter IS an ewma with alpha = K_inf — but early rows get the correct
time-varying gain instead of ewma's fixed one, which is why users
reach for it on short/restarting series.

Execution matches the engine's EWM family (operators/ewm.py,
operators/holt.py): one groupBy(key).applyInPandas pass — the single
sanctioned JVM<->Python boundary — with NaN-skip semantics (NULL rows
emit NULL, state untouched) and a (data, state) resumable variant whose
(head, then tail from head's state) replay is bit-identical to one
sweep, so plans/partitioning.py's segmented execution applies
unchanged.  State = 3 doubles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyg_timeseries_spark.kernels import cnative as _cnative
from pyg_timeseries_spark.operators._core import KEY, TS, VAL

_STATE_COL = "__state"
_PRIOR_COL = "__prior_state"
KALMAN_STATE_LEN = 3  # [seen, level, P]


def kalman_kernel(
    a: np.ndarray,
    q: float,
    r: float,
    state: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Sequential filtered-level sweep over one key's values.  Dispatches
    to the ctypes-compiled C twin (kernels/cnative.py:kalman_sweep —
    identical IEEE-754 op sequence, bit-equality asserted in
    tests/test_cnative.py) when a system compiler exists; the Python
    loop below is the always-available reference twin."""
    if not (q >= 0.0 and r > 0.0):
        raise ValueError("need q >= 0 and r > 0")
    if state is None:
        seen, lvl, p = 0.0, np.nan, np.nan
    else:
        seen, lvl, p = float(state[0]), float(state[1]), float(state[2])
    if _cnative.available():
        s = np.array([seen, lvl, p], dtype=np.float64)
        out = np.full(len(a), np.nan)
        av = np.ascontiguousarray(a, dtype=np.float64)
        _cnative.kalman_arrays(av, q, r, s, out)
        return out, s
    out = np.full(len(a), np.nan)
    for i in range(len(a)):
        x = a[i]
        if np.isnan(x):
            continue
        if seen == 0.0:
            lvl, p, seen = x, r, 1.0
        else:
            p_pred = p + q
            k = p_pred / (p_pred + r)
            lvl = lvl + k * (x - lvl)
            p = (1.0 - k) * p_pred
        out[i] = lvl
    return out, np.array([seen, lvl, p], dtype=np.float64)


def _kalman_combined(df, q, r, key, ts, v, out, state_df, with_state=True):
    """``with_state=False`` (the plain :func:`kalman` path) keeps the
    nullable ``array<double>`` state column out of BOTH Arrow transfers —
    object-typed columns cost far more to (de)serialize than the value
    columns, and the stateless caller drops the column unread anyway."""
    src = df
    if state_df is None:
        has_prior = False
    else:
        has_prior = True
        prior = state_df.select(F.col(key), F.col("state").alias(_PRIOR_COL))
        src = src.join(F.broadcast(prior), on=key, how="left")
    out_fields = [T.StructField(out, T.DoubleType())]
    if with_state:
        out_fields.append(
            T.StructField(_STATE_COL, T.ArrayType(T.DoubleType()))
        )
    out_schema = T.StructType(list(df.schema.fields) + out_fields)
    in_cols = [f.name for f in df.schema.fields]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts, kind="mergesort").reset_index(drop=True)
        a = pdf[v].to_numpy(dtype=np.float64, na_value=np.nan)
        state = None
        if has_prior:
            prior = pdf[_PRIOR_COL].iloc[0]
            if prior is not None and len(list(prior)) == KALMAN_STATE_LEN:
                state = np.asarray(list(prior), dtype=np.float64)
        res, s = kalman_kernel(a, q, r, state=state)
        outp = pdf[in_cols].copy()
        outp[out] = res
        if with_state:
            outp[_STATE_COL] = None
            outp.at[len(outp) - 1, _STATE_COL] = [float(x) for x in s]
        return outp

    return src.groupBy(key).applyInPandas(fn, schema=out_schema)


def kalman(
    df: DataFrame,
    q: float,
    r: float,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "kalman",
    state_df: DataFrame | None = None,
) -> DataFrame:
    """Filtered level per row (local-level model, process var ``q``,
    observation var ``r``)."""
    return _kalman_combined(df, q, r, key, ts, v, out, state_df,
                            with_state=False)


def kalman_(
    df: DataFrame,
    q: float,
    r: float,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "kalman",
    state_df: DataFrame | None = None,
    persist: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Stateful variant: (data, state) pair, resumable bit-for-bit."""
    combined = _kalman_combined(df, q, r, key, ts, v, out, state_df)
    if persist:
        combined = combined.persist()
    data = combined.drop(_STATE_COL)
    state = combined.filter(F.col(_STATE_COL).isNotNull()).select(
        F.col(key), F.col(_STATE_COL).alias("state")
    )
    return data, state
