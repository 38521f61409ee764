"""Shift / diff / ratio — NaN-skipping lags as Catalyst window expressions.

The reference's shift skips NaNs (the lag is the previous *valid* value —
/root/reference/src/pyg_timeseries/_rolling.py:377-407, 947-1005), unlike
pandas shift.  Long-format rendition: lag over the null-filtered frame, null
rows unioned back (operators/_core.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators._core import KEY, TS, VAL, apply_on_valid, wspec


def _bucket_lag(df: DataFrame, n: int, key: str, ts: str, v: str,
                time_col: str):
    """Clock semantics (reference _tdiff/_tratio, _rolling.py:335-346,
    370-374): the lag reference is the LAST valid value of the bucket n time
    units back — every row of a bucket diffs against the same base.
    Returns the df joined with a ``_lagv`` column."""
    valid = df.filter(F.col(v).isNotNull())
    last_per_bucket = valid.groupBy(key, time_col).agg(
        F.max_by(v, ts).alias("_bucket_last")
    )
    wb = Window.partitionBy(key).orderBy(time_col)
    lagged = last_per_bucket.withColumn(
        "_lagv", F.lag("_bucket_last", n).over(wb)
    ).select(key, time_col, "_lagv")
    return df.join(lagged, on=[key, time_col], how="left")


def shift(
    df: DataFrame,
    n: int = 1,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "shift",
    time_col: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """n-lag (n<0 = lead) over valid rows. Reference _rolling.py:947-1005.
    With ``time_col``, the lag is the last value of the bucket n units back.
    Pass ``tiebreak`` when (key, ts) may repeat (see _core.wspec)."""
    if time_col:
        joined = _bucket_lag(df, n, key, ts, v, time_col)
        return joined.withColumn(
            out, F.when(F.col(v).isNotNull(), F.col("_lagv"))
        ).drop("_lagv")
    w = wspec(key, ts, tiebreak)
    expr = F.lag(v, n).over(w) if n >= 0 else F.lead(v, -n).over(w)
    return apply_on_valid(df, out, expr, v=v)


def diff(
    df: DataFrame,
    n: int = 1,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "diff",
    time_col: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """n-period difference over valid rows (diff(a,0) == zeros-with-NaNs,
    reference _rolling.py:818-870, 847-848); clock-aware with ``time_col``
    (golden vectors: reference tests/test_ts_rolling.py:7-17)."""
    if n == 0:
        return df.withColumn(out, F.col(v) - F.col(v))
    if time_col:
        joined = _bucket_lag(df, n, key, ts, v, time_col)
        return joined.withColumn(out, F.col(v) - F.col("_lagv")).drop("_lagv")
    w = wspec(key, ts, tiebreak)
    lagv = F.lag(v, n).over(w) if n > 0 else F.lead(v, -n).over(w)
    return apply_on_valid(df, out, F.col(v) - lagv, v=v)


def ratio(
    df: DataFrame,
    n: int = 1,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "ratio",
    time_col: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """n-period ratio; NULL when the lagged value is 0 (reference
    _rolling.py:349-368, 1007-1044); clock-aware with ``time_col``."""
    if time_col:
        joined = _bucket_lag(df, n, key, ts, v, time_col)
        return joined.withColumn(
            out, F.when(F.col("_lagv") != 0.0, F.col(v) / F.col("_lagv"))
        ).drop("_lagv")
    w = wspec(key, ts, tiebreak)
    lagv = F.lag(v, n).over(w) if n > 0 else F.lead(v, -n).over(w)
    expr = F.when(lagv != 0.0, F.col(v) / lagv)
    return apply_on_valid(df, out, expr, v=v)


def fracdiff_weights(d: float, n: int) -> list[float]:
    """Fixed-width fractional-differencing weights w_0..w_{n-1}:
    w_0 = 1, w_k = -w_{k-1} (d - k + 1) / k — the binomial expansion of
    (1 - B)^d truncated at n terms (Hosking 1981; the fixed-width FFD
    rendition popularized by Lopez de Prado, Advances in Financial
    Machine Learning ch. 5)."""
    ws = [1.0]
    for k in range(1, n):
        ws.append(-ws[-1] * (d - k + 1) / k)
    return ws


def fracdiff(
    df: DataFrame,
    d: float,
    n: int,
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    out: str = "fracdiff",
) -> DataFrame:
    """Fixed-width fractional differencing over the last ``n`` valid
    observations: out_t = Σ_{k=0}^{n-1} w_k x_{t-k}, gated NULL until the
    window is full (same count-n semantics as the rolling family —
    reference window gating _rolling.py:446-463; the d=1, n=2 case
    degenerates to :func:`diff`).

    Scale shape: ONE trailing collect_list window (oldest→newest) dotted
    against a literal weight array with ``zip_with`` + ``aggregate`` —
    O(n) per row entirely inside the JVM, one Exchange on key, no
    per-lag window expression blowup for large n.  The fold adds terms
    oldest→newest so an oracle summing lag terms in the same order is
    bit-identical."""
    if n < 1:
        raise ValueError("n must be >= 1")
    from pyg_timeseries_spark.operators._core import w_rows

    ws = fracdiff_weights(float(d), n)
    # collect_list over the frame is oldest→newest; w_0 belongs to the
    # newest element, so align against the reversed weight array.
    rev = F.array(*[F.lit(float(x)) for x in reversed(ws)])
    w = w_rows(n, key, ts)
    arr = F.collect_list(v).over(w)
    cnt = F.count(v).over(w)
    dot = F.aggregate(
        F.zip_with(arr, rev, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return apply_on_valid(df, out, F.when(cnt >= n, dot), v=v)


def make_lags(
    df: DataFrame,
    lags=(1, 2, 5),
    key: str = KEY,
    ts: str = TS,
    v: str = VAL,
    prefix: str = "lag",
) -> DataFrame:
    """Feature-engineering fan-out: every requested NaN-skip lag of ``v``
    as its own column in ONE window pass (negative entries are leads).
    The ML-pipeline companion of :func:`shift` — N separate shift()
    calls would still fuse into one Window in Catalyst, but this keeps
    the intent (and the null-row union) in one place.  Null rows get
    NULL in every lag column."""
    lags = [int(k) for k in lags]
    if not lags:
        raise ValueError("lags must be non-empty")
    w = wspec(key, ts)
    cols = {
        f"{prefix}_{k}": (F.lag(v, k).over(w) if k >= 0 else F.lead(v, -k).over(w))
        for k in lags
    }
    valid = df.filter(F.col(v).isNotNull()).select(
        *df.columns, *[c.alias(n) for n, c in cols.items()]
    )
    nulls = df.filter(F.col(v).isNull()).select(
        *df.columns,
        *[F.lit(None).cast(valid.schema[n].dataType).alias(n) for n in cols],
    )
    return valid.unionByName(nulls)
