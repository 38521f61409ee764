"""Composite operator DAGs with nested state — the reference's model for
multi-operator checkpoints (`_ewmxo.py:61-110`: ewmacd returns
Dict(data, state=Dict(fast, slow, vol, diff))).

In Spark the nested state is a dict of small state DataFrames, persisted
together by the RollupStore under one op name.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators._core import KEY, TS, VAL
from pyg_timeseries_spark.operators.ewm import ewma_, ewmrms_, ewmstd_
from pyg_timeseries_spark.operators.shift import diff as diff_op
from pyg_timeseries_spark.operators.window_state import make_stateful


def _frac(n: float) -> float:
    return 1.0 / (1.0 + n) if n >= 1 else 1.0 - float(n)


def ou_factor(fast: float, slow: float) -> float:
    """Variance normalizer of the EWM crossover of a Brownian motion —
    reference `_ewmxo.py:9-58`: sqrt(F²/(1-F²) + S²/(1-S²) - 2FS/(1-FS))."""
    f = _frac(fast)
    s = _frac(slow)
    Fw, Sw = 1 - f, 1 - s
    return math.sqrt(
        Fw * Fw / (1 - Fw * Fw) + Sw * Sw / (1 - Sw * Sw)
        - 2 * Fw * Sw / (1 - Fw * Sw)
    )


diff_ = make_stateful(diff_op, state_n=1)


def ewmacd_(
    df: DataFrame,
    fast: float,
    slow: float,
    vol: float | None = None,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "ewmacd",
    rms: bool = True,
    state: dict | None = None,
    persist: bool = True,
) -> tuple[DataFrame, dict]:
    """Normalized EWM crossover:
    (ewma(x, fast) - ewma(x, slow)) / (ewm_vol(diff(x,1), vol) * ou_factor).

    Returns (data, state_dict) with nested per-sub-operator state
    (reference `_ewmxo.py:61-110`)."""
    state = state or {}
    fast_data, fast_state = ewma_(
        df, fast, key=key, ts=ts, v=v, out="_fast",
        state_df=state.get("fast"), persist=False,
    )
    both, slow_state = ewma_(
        fast_data, slow, key=key, ts=ts, v=v, out="_slow",
        state_df=state.get("slow"), persist=False,
    )
    rtn, diff_state = diff_(both, 1, key=key, ts=ts, v=v, out="_rtn",
                            state_df=state.get("diff"))
    if vol is None:
        normalized = rtn.withColumn(
            out, (F.col("_fast") - F.col("_slow")) / F.lit(ou_factor(fast, slow))
        )
        vol_state = None
    else:
        vol_op = ewmrms_ if rms else ewmstd_
        with_vol, vol_state = vol_op(
            rtn, vol, key=key, ts=ts, v="_rtn", out="_vol",
            state_df=state.get("vol"), persist=False,
        )
        # vol==0 → NULL (reference v2na on the vol denominator)
        denom = F.when(F.col("_vol") != 0, F.col("_vol")) * F.lit(ou_factor(fast, slow))
        normalized = with_vol.withColumn(
            out, (F.col("_fast") - F.col("_slow")) / denom
        ).drop("_vol")
    data = normalized.drop("_fast", "_slow", "_rtn")
    if persist:
        data = data.persist()
    return data, {
        "fast": fast_state, "slow": slow_state,
        "vol": vol_state, "diff": diff_state,
    }


def ewmacd(df: DataFrame, fast: float, slow: float, vol: float | None = None,
           **kw) -> DataFrame:
    data, _ = ewmacd_(df, fast, slow, vol, persist=False, **kw)
    return data


def ewmvol_(
    df: DataFrame,
    n: float,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "ewmvol",
    rms: bool = True,
    state: dict | None = None,
    persist: bool = True,
) -> tuple[DataFrame, dict]:
    """EWM vol of price *changes*: ewmrms(diff(x,1), n) — reference
    `_ewmxo.py:115-146`."""
    state = state or {}
    rtn, diff_state = diff_(df, 1, key=key, ts=ts, v=v, out="_rtn",
                            state_df=state.get("diff"))
    vol_op = ewmrms_ if rms else ewmstd_
    data, vol_state = vol_op(rtn, n, key=key, ts=ts, v="_rtn", out=out,
                             state_df=state.get("vol"), persist=persist)
    return data.drop("_rtn"), {"vol": vol_state, "diff": diff_state}


def ewmvol(df: DataFrame, n: float, **kw) -> DataFrame:
    data, _ = ewmvol_(df, n, persist=False, **kw)
    return data
