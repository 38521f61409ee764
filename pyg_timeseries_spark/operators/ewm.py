"""EWM operators over long-format frames — Arrow-batched ``applyInPandas``
around the sequential kernels in kernels/ewm_numpy.py.

This is the engine's one JVM↔Python boundary (SURVEY.md §3.4): per key the
group arrives as a pandas DataFrame over Arrow, is swept once by the NumPy
kernel, and returns the output column plus (for the ``*_`` stateful variants)
one packed state row.  No per-row Python anywhere (input_hint requirement) —
the kernel loop is per-row *inside* one vectorized batch, the same shape as
the reference's numba kernels.

Scale notes:
* groupBy(key).applyInPandas shuffles once on key; a group must fit in one
  python worker.  The engine's rollup pipeline only runs EWM over *bucketed*
  tiers (1m/1h/1d), so group size is bounded by the retention window, not by
  raw row count (SURVEY.md §7.3).
* For skewed/huge keys, plans/partitioning.py provides time-segmented
  execution with state chaining: segment k's final state seeds segment k+1 —
  bit-identical to one sweep because the kernel recurrence is sequential.

Reference parity: _ewm.py:1326-1426 (ewma), :1429-1553 (ewmrms), :1555-1683
(ewmstd), :1686-1783 (ewmvar), :2139-2232 (ewmskew); (data, state) pair
convention _decorators.py:21-31.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyg_timeseries_spark.kernels import ewm_numpy
from pyg_timeseries_spark.kernels.ewm_numpy import STATE_LEN
from pyg_timeseries_spark.operators._core import KEY, TS, VAL

_STATE_COL = "__state"
_PRIOR_COL = "__prior_state"


def state_schema(key: str = KEY) -> T.StructType:
    return T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField("state", T.ArrayType(T.DoubleType())),
        ]
    )


def _with_prior(df: DataFrame, state_df: DataFrame | None, key: str) -> DataFrame:
    if state_df is None:
        return df.withColumn(_PRIOR_COL, F.lit(None).cast(T.ArrayType(T.DoubleType())))
    prior = state_df.select(F.col(key), F.col("state").alias(_PRIOR_COL))
    # state is one small row per key — always broadcast, never shuffle the fact side
    return df.join(F.broadcast(prior), on=key, how="left")


def _ewm_combined(
    df: DataFrame,
    kernel_name: str,
    n: float,
    key: str,
    ts: str,
    v: str,
    out: str,
    time_col: str | None,
    state_df: DataFrame | None,
    kernel_kwargs: dict,
    wgt_col: str | None = None,
) -> DataFrame:
    """One applyInPandas pass emitting data rows + a packed state column that
    is non-null only on the group's last row."""
    kernel = ewm_numpy.KERNELS[kernel_name]
    src = _with_prior(df, state_df, key)
    out_fields = [f for f in df.schema.fields] + [
        T.StructField(out, T.DoubleType()),
        T.StructField(_STATE_COL, T.ArrayType(T.DoubleType())),
    ]
    out_schema = T.StructType(out_fields)
    in_cols = [f.name for f in df.schema.fields]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts, kind="mergesort").reset_index(drop=True)
        a = pdf[v].to_numpy(dtype=np.float64, na_value=np.nan)
        time = (
            pdf[time_col].to_numpy(dtype=np.float64, na_value=np.nan)
            if time_col
            else None
        )
        wgt = (
            pdf[wgt_col].to_numpy(dtype=np.float64, na_value=np.nan)
            if wgt_col
            else None
        )
        prior = pdf[_PRIOR_COL].iloc[0]
        state = (
            np.asarray(list(prior), dtype=np.float64)
            if prior is not None
            and len(list(prior)) in (STATE_LEN, ewm_numpy.GSTATE_LEN)
            else None
        )
        res, s = kernel(a, n, time=time, wgt=wgt, state=state, **kernel_kwargs)
        outp = pdf[in_cols].copy()
        outp[out] = res
        outp[_STATE_COL] = None
        outp.at[len(outp) - 1, _STATE_COL] = [float(x) for x in s]
        return outp

    return src.groupBy(key).applyInPandas(fn, schema=out_schema)


def _make_op(kernel_name: str, default_out: str):
    def op(
        df: DataFrame,
        n: float,
        key: str = KEY,
        ts: str = TS,
        v: str = VAL,
        out: str = default_out,
        time_col: str | None = None,
        wgt_col: str | None = None,
        state_df: DataFrame | None = None,
        **kernel_kwargs,
    ) -> DataFrame:
        combined = _ewm_combined(
            df, kernel_name, n, key, ts, v, out, time_col, state_df,
            kernel_kwargs, wgt_col=wgt_col,
        )
        return combined.drop(_STATE_COL)

    def op_(
        df: DataFrame,
        n: float,
        key: str = KEY,
        ts: str = TS,
        v: str = VAL,
        out: str = default_out,
        time_col: str | None = None,
        wgt_col: str | None = None,
        state_df: DataFrame | None = None,
        persist: bool = True,
        **kernel_kwargs,
    ) -> tuple[DataFrame, DataFrame]:
        """Stateful variant: returns (data, state) — the reference's
        ``Dict(data=…, state=…)`` pair (_decorators.py:21-31).  The combined
        frame is persisted so data and state come from one computation."""
        combined = _ewm_combined(
            df, kernel_name, n, key, ts, v, out, time_col, state_df,
            kernel_kwargs, wgt_col=wgt_col,
        )
        if persist:
            combined = combined.persist()
        data = combined.drop(_STATE_COL)
        state = (
            combined.filter(F.col(_STATE_COL).isNotNull())
            .select(F.col(key), F.col(_STATE_COL).alias("state"))
        )
        return data, state

    op.__name__ = kernel_name
    op_.__name__ = kernel_name + "_"
    op.__doc__ = ewm_numpy.KERNELS[kernel_name].__doc__
    op_.__doc__ = (op_.__doc__ or "") + f"\nKernel: {kernel_name}."
    return op, op_


ewma, ewma_ = _make_op("ewma", "ewma")
ewmrms, ewmrms_ = _make_op("ewmrms", "ewmrms")
ewmstd, ewmstd_ = _make_op("ewmstd", "ewmstd")
ewmvar, ewmvar_ = _make_op("ewmvar", "ewmvar")
ewmskew, ewmskew_ = _make_op("ewmskew", "ewmskew")
