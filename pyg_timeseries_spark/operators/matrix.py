"""Spark wrappers for the matrix EWM kernels over frames with an
``array<double>`` feature column.

Reference: ewmAAi `_ewm.py:936-980, 1917-1937`; ewmGLM `_ewm.py:983-1123,
1940-2020`.  The feature vector per (key, ts) row is the long-format
rendition of the reference's panel row; outputs are flattened row-major
arrays (melt with posexplode when relational access is wanted).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyg_timeseries_spark.kernels import matrix_numpy as MK
from pyg_timeseries_spark.operators._core import KEY, TS

_STATE_COL = "__state"
_PRIOR_COL = "__prior_state"


def _matrix_apply(df, key, ts, build_inputs, run, out, state_df, state_len):
    if state_df is not None:
        prior = state_df.select(F.col(key), F.col("state").alias(_PRIOR_COL))
        src = df.join(F.broadcast(prior), on=key, how="left")
    else:
        src = df.withColumn(_PRIOR_COL, F.lit(None).cast(T.ArrayType(T.DoubleType())))
    in_cols = [f.name for f in df.schema.fields]
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out, T.ArrayType(T.DoubleType())),
           T.StructField(_STATE_COL, T.ArrayType(T.DoubleType()))]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts, kind="mergesort").reset_index(drop=True)
        inputs = build_inputs(pdf)
        prior = pdf[_PRIOR_COL].iloc[0]
        state = (
            np.asarray(list(prior), float)
            if prior is not None and (state_len < 0 or len(list(prior)) == state_len)
            else None
        )
        res, s = run(*inputs, state)
        outp = pdf[in_cols].copy()
        outp[out] = [
            None if np.isnan(r).all() else [float(x) for x in r.ravel()]
            for r in res
        ]
        outp[_STATE_COL] = None
        outp.at[len(outp) - 1, _STATE_COL] = [float(x) for x in s]
        return outp

    return src.groupBy(key).applyInPandas(fn, schema=out_schema)


def _features_matrix(pdf, features):
    return np.array([np.asarray(r, float) for r in pdf[features]])


def ewmAAi(df: DataFrame, n: float, features: str = "features",
           key: str = KEY, ts: str = TS, out: str = "aai",
           min_sample: float = 0.25, overlapping: int = 1,
           state_df: DataFrame | None = None) -> DataFrame:
    """Rolling inv(E(dAᵀdA)) per row; output flattened (m·m) row-major.
    ``overlapping`` k differences against the value k valid rows back."""

    def build(pdf):
        return (_features_matrix(pdf, features),)

    # state length depends on m, so validate inside the kernel call
    def run2(A, state):
        if state is not None and len(state) != MK.aai_state_len(
                A.shape[1], overlapping):
            state = None
        return MK.ewmAAi(A, n, state=state, min_sample=min_sample,
                         overlapping=overlapping)

    return _matrix_apply(
        df, key, ts, build, run2, out, state_df, state_len=-1
    ).drop(_STATE_COL)


def ewmAAi_(df: DataFrame, n: float, features: str = "features",
            key: str = KEY, ts: str = TS, out: str = "aai",
            min_sample: float = 0.25, overlapping: int = 1,
            state_df: DataFrame | None = None, persist: bool = True):
    def build(pdf):
        return (_features_matrix(pdf, features),)

    def run2(A, state):
        if state is not None and len(state) != MK.aai_state_len(
                A.shape[1], overlapping):
            state = None
        return MK.ewmAAi(A, n, state=state, min_sample=min_sample,
                         overlapping=overlapping)

    combined = _matrix_apply(df, key, ts, build, run2, out, state_df, state_len=-1)
    if persist:
        combined = combined.persist()
    data = combined.drop(_STATE_COL)
    state = combined.filter(F.col(_STATE_COL).isNotNull()).select(
        key, F.col(_STATE_COL).alias("state")
    )
    return data, state


def ewmGLM(df: DataFrame, n: float, features: str = "features",
           b: str = "v", key: str = KEY, ts: str = TS, out: str = "betas",
           min_sample: float = 0.25, overlapping: int = 1,
           state_df: DataFrame | None = None) -> DataFrame:
    """EWM linear-model betas of db ~ dA per row; output (m,) array."""

    def build(pdf):
        A = _features_matrix(pdf, features)
        bv = pdf[b].to_numpy(dtype=np.float64, na_value=np.nan)
        return (A, bv)

    def run2(A, bv, state):
        if state is not None and len(state) != MK.glm_state_len(
                A.shape[1], overlapping):
            state = None
        return MK.ewmGLM(A, bv, n, state=state, min_sample=min_sample,
                         overlapping=overlapping)

    return _matrix_apply(
        df, key, ts, build, run2, out, state_df, state_len=-1
    ).drop(_STATE_COL)


def ewmGLM_(df: DataFrame, n: float, features: str = "features",
            b: str = "v", key: str = KEY, ts: str = TS, out: str = "betas",
            min_sample: float = 0.25, overlapping: int = 1,
            state_df: DataFrame | None = None, persist: bool = True):
    def build(pdf):
        A = _features_matrix(pdf, features)
        bv = pdf[b].to_numpy(dtype=np.float64, na_value=np.nan)
        return (A, bv)

    def run2(A, bv, state):
        if state is not None and len(state) != MK.glm_state_len(
                A.shape[1], overlapping):
            state = None
        return MK.ewmGLM(A, bv, n, state=state, min_sample=min_sample,
                         overlapping=overlapping)

    combined = _matrix_apply(df, key, ts, build, run2, out, state_df, state_len=-1)
    if persist:
        combined = combined.persist()
    data = combined.drop(_STATE_COL)
    state = combined.filter(F.col(_STATE_COL).isNotNull()).select(
        key, F.col(_STATE_COL).alias("state")
    )
    return data, state


def ewmcorr_psd(df: DataFrame, n: float = 128, features: str = "features",
                key: str = KEY, ts: str = TS, out: str = "psd_cor",
                min_sample: float = 0.25, min_periods: int = 1,
                demean: bool = True, shrinkage: float = 0.0,
                state_df: DataFrame | None = None) -> DataFrame:
    """PSD-by-construction EWM correlation per row (flattened m·m);
    reference `_ewm_psd.py:43-287` (overlapping=1 path)."""

    def build(pdf):
        return (_features_matrix(pdf, features),)

    def run2(A, state):
        if state is not None and len(state) != MK.psd_state_len(A.shape[1]):
            state = None
        return MK.ewmcorr_psd(A, n, min_sample=min_sample,
                              min_periods=min_periods, demean=demean,
                              shrinkage=shrinkage, state=state)

    return _matrix_apply(
        df, key, ts, build, run2, out, state_df, state_len=-1
    ).drop(_STATE_COL)


def ewmcorr_psd_(df: DataFrame, n: float = 128, features: str = "features",
                 key: str = KEY, ts: str = TS, out: str = "psd_cor",
                 min_sample: float = 0.25, min_periods: int = 1,
                 demean: bool = True, shrinkage: float = 0.0,
                 state_df: DataFrame | None = None, persist: bool = True):
    def build(pdf):
        return (_features_matrix(pdf, features),)

    def run2(A, state):
        if state is not None and len(state) != MK.psd_state_len(A.shape[1]):
            state = None
        return MK.ewmcorr_psd(A, n, min_sample=min_sample,
                              min_periods=min_periods, demean=demean,
                              shrinkage=shrinkage, state=state)

    combined = _matrix_apply(df, key, ts, build, run2, out, state_df, state_len=-1)
    if persist:
        combined = combined.persist()
    data = combined.drop(_STATE_COL)
    state = combined.filter(F.col(_STATE_COL).isNotNull()).select(
        key, F.col(_STATE_COL).alias("state")
    )
    return data, state
