"""(data, state) pairs for the Catalyst-native window operators.

The EWM kernels carry explicit scalar state (kernels/ewm_numpy.py).  For the
window-expressible family (shift/diff/ratio, rolling_*, ffill) the minimal
sufficient state is the key's last n valid rows — the ring buffer ``vec`` of
the reference (`_rolling.py:16-31`, `_vec`), kept as *rows* instead of a
packed array.  Resume = union the state rows in front of the new batch, run
the identical window expression, drop outputs at or before the checkpoint
time.  Spark evaluates bounded ROWS frames by re-accumulating each frame
left-to-right, so the resumed outputs are bit-identical to a full run (the
frame contents are identical row sets in identical order).

For the expanding family the sufficient state is the running moment sums —
resumable via the same row mechanism only for n-bounded ops; cumsum/
expanding_* instead carry (t0..t3, min, max) per key and combine by column
arithmetic (`expanding_state` / `resume_expanding` below), which is exact in
the integer domain of the rollup tables.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators._core import KEY, TS, VAL


def tail_state(df: DataFrame, n: int, key: str = KEY, ts: str = TS,
               v: str = VAL) -> DataFrame:
    """State table: last ``n`` *valid* rows per key (key, ts, v)."""
    w = Window.partitionBy(key).orderBy(F.col(ts).desc())
    return (
        df.filter(F.col(v).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .select(key, ts, v)
    )


def resume(
    new_df: DataFrame,
    state_df: DataFrame,
    op: Callable[..., DataFrame],
    key: str = KEY,
    ts: str = TS,
    **op_kwargs,
) -> DataFrame:
    """Apply a window operator to new rows as if the full history preceded
    them: prepend the state rows, compute, emit only the new rows."""
    cutoff = state_df.groupBy(key).agg(F.max(ts).alias("_cut"))
    prepended = new_df.unionByName(state_df, allowMissingColumns=True)
    out = op(prepended, key=key, ts=ts, **op_kwargs)
    out = out.join(F.broadcast(cutoff), on=key, how="left")
    return out.filter(
        F.col("_cut").isNull() | (F.col(ts) > F.col("_cut"))
    ).drop("_cut")


def make_stateful(op: Callable[..., DataFrame], state_n: int):
    """Wrap a window operator into the reference's ``f_`` convention
    (_decorators.py:21-31): returns (data, state)."""

    def op_(df: DataFrame, *args, key: str = KEY, ts: str = TS, v: str = VAL,
            state_df: DataFrame | None = None, **kwargs):
        bound = lambda d, **kw: op(d, *args, **kw)  # noqa: E731
        if state_df is not None:
            data = resume(df, state_df, bound, key=key, ts=ts, v=v, **kwargs)
            hist = df.unionByName(
                state_df.select(key, ts, v), allowMissingColumns=True
            )
        else:
            data = bound(df, key=key, ts=ts, v=v, **kwargs)
            hist = df
        state = tail_state(hist, state_n, key=key, ts=ts, v=v)
        return data, state

    op_.__name__ = op.__name__ + "_"
    return op_


# -- expanding family: moment-sum state --------------------------------------

def expanding_state(df: DataFrame, key: str = KEY, v: str = VAL) -> DataFrame:
    """Per-key running moments (t0..t3, min, max) — the reference's resumable
    moment vector (_ts.py:26-37)."""
    c = F.col(v)
    return df.groupBy(key).agg(
        F.count(c).cast("double").alias("t0"),
        F.sum(c).alias("t1"),
        F.sum(c * c).alias("t2"),
        F.sum(c * c * c).alias("t3"),
        F.min(c).alias("m_min"),
        F.max(c).alias("m_max"),
    )


def resume_cumsum(new_df: DataFrame, state_df: DataFrame, key: str = KEY,
                  ts: str = TS, v: str = VAL, out: str = "cumsum") -> DataFrame:
    """cumsum over new rows offset by the prior per-key sum — exact in the
    integer domain; one broadcast join, no recompute of history."""
    from pyg_timeseries_spark.operators.expanding import cumsum

    local = cumsum(new_df, key=key, ts=ts, v=v, out=out)
    prior = state_df.select(key, F.col("t1").alias("_prior"))
    return (
        local.join(F.broadcast(prior), on=key, how="left")
        .withColumn(out, F.col(out) + F.coalesce(F.col("_prior"), F.lit(0.0)))
        .drop("_prior")
    )
