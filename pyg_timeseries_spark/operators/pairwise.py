"""Pairwise EWM operators over long-format frames.

* ``ewmxcor`` / ``ewmxcovar`` / ``ewmxLR`` — two value columns on one keyed
  frame (the reference's two-panel form, `_ewm.py:1805-2137`).
* ``ewmcorrelation`` / ``ewmcovariance`` — the (t, m, m) tensor
  (`_ewm.py:395-531, 535-921`) in **melted long format**: one row per
  (ts, key_i, key_j) — the Spark-native tensor layout (SURVEY.md §1.3).
  Pairs are built by a self-join of the series on ts (m² fan-out of *keys*,
  not data volume), then each (key_i, key_j) group runs the pairwise kernel.

At scale: the self-join shuffles on ts once; pair groups are independent and
parallel.  For m in the hundreds (the reference's own regime, a (7000,
200, 200) tensor) this is ~20k pair-series of bucketed length — exactly the
applyInPandas group-size envelope the engine is designed for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyg_timeseries_spark.kernels import pairwise_numpy as PK
from pyg_timeseries_spark.operators._core import KEY, TS, VAL

_STATE_COL = "__state"
_PRIOR_COL = "__prior_state"


def _pair_apply(df, key_cols, ts, a, b, out_cols, state_df, run,
                time_col=None):
    if state_df is not None:
        prior = state_df.select(*key_cols, F.col("state").alias(_PRIOR_COL))
        src = df.join(F.broadcast(prior), on=key_cols, how="left")
    else:
        src = df.withColumn(_PRIOR_COL, F.lit(None).cast(T.ArrayType(T.DoubleType())))
    in_cols = [f.name for f in df.schema.fields]
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(c, T.DoubleType()) for c in out_cols]
        + [T.StructField(_STATE_COL, T.ArrayType(T.DoubleType()))]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts, kind="mergesort").reset_index(drop=True)
        av = pdf[a].to_numpy(dtype=np.float64, na_value=np.nan)
        bv = pdf[b].to_numpy(dtype=np.float64, na_value=np.nan)
        tv = (
            pdf[time_col].to_numpy(dtype=np.float64, na_value=np.nan)
            if time_col
            else None
        )
        prior = pdf[_PRIOR_COL].iloc[0]
        state = (
            np.asarray(list(prior), float)
            if prior is not None and len(list(prior)) == PK.XSTATE_LEN
            else None
        )
        results, s = run(av, bv, state, tv)
        outp = pdf[in_cols].copy()
        for c, r in zip(out_cols, results):
            outp[c] = r
        outp[_STATE_COL] = None
        outp.at[len(outp) - 1, _STATE_COL] = [float(x) for x in s]
        return outp

    return src.groupBy(*key_cols).applyInPandas(fn, schema=out_schema)


def _split_state(combined: DataFrame, key_cols: list, persist: bool):
    """(data, state) from one combined frame — one computation, reference
    (data, state) contract (_decorators.py:21-31)."""
    if persist:
        combined = combined.persist()
    data = combined.drop(_STATE_COL)
    state = combined.filter(F.col(_STATE_COL).isNotNull()).select(
        *key_cols, F.col(_STATE_COL).alias("state")
    )
    return data, state


def ewmxcor(df: DataFrame, n: float, a: str, b: str, key: str = KEY,
            ts: str = TS, out: str = "ewmxcor", bias: bool = False,
            time_col: str | None = None,
            state_df: DataFrame | None = None) -> DataFrame:
    def run(av, bv, state, tv):
        res, s = PK.ewmxcor(av, bv, n, time=tv, state=state, bias=bias)
        return [res], s

    return _pair_apply(df, [key], ts, a, b, [out], state_df, run,
                       time_col=time_col).drop(_STATE_COL)


def ewmxcor_(df: DataFrame, n: float, a: str, b: str, key: str = KEY,
             ts: str = TS, out: str = "ewmxcor", bias: bool = False,
             time_col: str | None = None,
             state_df: DataFrame | None = None, persist: bool = True):
    def run(av, bv, state, tv):
        res, s = PK.ewmxcor(av, bv, n, time=tv, state=state, bias=bias)
        return [res], s

    combined = _pair_apply(df, [key], ts, a, b, [out], state_df, run,
                           time_col=time_col)
    return _split_state(combined, [key], persist)


def ewmxcovar(df: DataFrame, n: float, a: str, b: str, key: str = KEY,
              ts: str = TS, out: str = "ewmxcovar",
              time_col: str | None = None,
              state_df: DataFrame | None = None) -> DataFrame:
    def run(av, bv, state, tv):
        res, s = PK.ewmxcovar(av, bv, n, time=tv, state=state)
        return [res], s

    return _pair_apply(df, [key], ts, a, b, [out], state_df, run,
                       time_col=time_col).drop(_STATE_COL)


def ewmxcovar_(df: DataFrame, n: float, a: str, b: str, key: str = KEY,
               ts: str = TS, out: str = "ewmxcovar",
               time_col: str | None = None,
               state_df: DataFrame | None = None, persist: bool = True):
    def run(av, bv, state, tv):
        res, s = PK.ewmxcovar(av, bv, n, time=tv, state=state)
        return [res], s

    combined = _pair_apply(df, [key], ts, a, b, [out], state_df, run,
                           time_col=time_col)
    return _split_state(combined, [key], persist)


def ewmxLR(df: DataFrame, n: float, a: str, b: str, key: str = KEY,
           ts: str = TS, out_c: str = "lr_c", out_m: str = "lr_m",
           bias: bool = False, time_col: str | None = None,
           state_df: DataFrame | None = None) -> DataFrame:
    def run(av, bv, state, tv):
        c, m, s = PK.ewmxLR(av, bv, n, time=tv, state=state, bias=bias)
        return [c, m], s

    return _pair_apply(df, [key], ts, a, b, [out_c, out_m], state_df, run,
                       time_col=time_col).drop(_STATE_COL)


def ewmxLR_(df: DataFrame, n: float, a: str, b: str, key: str = KEY,
            ts: str = TS, out_c: str = "lr_c", out_m: str = "lr_m",
            bias: bool = False, time_col: str | None = None,
            state_df: DataFrame | None = None, persist: bool = True):
    def run(av, bv, state, tv):
        c, m, s = PK.ewmxLR(av, bv, n, time=tv, state=state, bias=bias)
        return [c, m], s

    combined = _pair_apply(df, [key], ts, a, b, [out_c, out_m], state_df, run,
                           time_col=time_col)
    return _split_state(combined, [key], persist)


# ---- melted (t, m, m) tensors ----------------------------------------------


def _melt_pairs(df: DataFrame, key: str, ts: str, v: str,
                upper_only: bool = True) -> DataFrame:
    left = df.select(F.col(ts), F.col(key).alias("key_i"), F.col(v).alias("v_i"))
    right = df.select(F.col(ts), F.col(key).alias("key_j"), F.col(v).alias("v_j"))
    pairs = left.join(right, on=ts)
    if upper_only:
        pairs = pairs.filter(F.col("key_i") < F.col("key_j"))
    else:
        pairs = pairs.filter(F.col("key_i") != F.col("key_j"))
    return pairs


def _correlation_combined(df, n, key, ts, v, bias, state_df, out):
    pairs = _melt_pairs(df, key, ts, v)

    def run(av, bv, state, tv):
        res, s = PK.ewmxcor(av, bv, n, time=tv, state=state, bias=bias)
        return [res], s

    return _pair_apply(
        pairs, ["key_i", "key_j"], ts, "v_i", "v_j", [out], state_df, run
    )


def ewmcorrelation(df: DataFrame, n: float, key: str = KEY, ts: str = TS,
                   v: str = VAL, bias: bool = False,
                   state_df: DataFrame | None = None,
                   out: str = "cor") -> DataFrame:
    """Melted EWM correlation tensor: rows (ts, key_i, key_j, cor) for
    key_i < key_j (symmetric; diagonal ≡ 1).  Reference `_ewm.py:688-921`."""
    return _correlation_combined(df, n, key, ts, v, bias, state_df, out).drop(_STATE_COL)


def ewmcorrelation_(df: DataFrame, n: float, key: str = KEY, ts: str = TS,
                    v: str = VAL, bias: bool = False,
                    state_df: DataFrame | None = None,
                    out: str = "cor", persist: bool = True):
    """Stateful melted correlation tensor: (data, state) where state holds
    one packed XSTATE row per (key_i, key_j) pair — resume is bit-exact
    (reference ewmcorrelation_ `_ewm.py:688-770`)."""
    combined = _correlation_combined(df, n, key, ts, v, bias, state_df, out)
    return _split_state(combined, ["key_i", "key_j"], persist)


def _covariance_combined(df, n, key, ts, v, state_df, out):
    left = df.select(F.col(ts), F.col(key).alias("key_i"), F.col(v).alias("v_i"))
    right = df.select(F.col(ts), F.col(key).alias("key_j"), F.col(v).alias("v_j"))
    pairs = left.join(right, on=ts).filter(F.col("key_i") <= F.col("key_j"))

    def run(av, bv, state, tv):
        res, s = PK.ewmxcovar(av, bv, n, time=tv, state=state)
        return [res], s

    return _pair_apply(
        pairs, ["key_i", "key_j"], ts, "v_i", "v_j", [out], state_df, run
    )


def ewmcovariance(df: DataFrame, n: float, key: str = KEY, ts: str = TS,
                  v: str = VAL, state_df: DataFrame | None = None,
                  out: str = "cov") -> DataFrame:
    """Melted EWM covariance tensor incl. the diagonal (variances).
    Reference `_ewm.py:535-685`."""
    return _covariance_combined(df, n, key, ts, v, state_df, out).drop(_STATE_COL)


def ewmcovariance_(df: DataFrame, n: float, key: str = KEY, ts: str = TS,
                   v: str = VAL, state_df: DataFrame | None = None,
                   out: str = "cov", persist: bool = True):
    """Stateful melted covariance tensor: (data, state) keyed on
    (key_i, key_j) (reference ewmcovariance_ `_ewm.py:535-614`)."""
    combined = _covariance_combined(df, n, key, ts, v, state_df, out)
    return _split_state(combined, ["key_i", "key_j"], persist)
