"""Shared machinery for the long-format operators.

Every operator acts on a long-format DataFrame ``(key, ts, v)`` and appends an
output column.  The reference's NaN-skip semantics (a NaN row contributes
nothing to the state and outputs NaN — /root/reference/src/pyg_timeseries/
_rolling.py:454-463) are reproduced *without* a join: rows with a NULL value
are split off, the window runs over valid rows only, and the NULL rows are
unioned back with a NULL output.  This is the Spark-native rendition of the
reference's "compute on nona(a), reindex back" identity
(/root/reference/tests/test_ts.py:54-68), and it is cheap: the union is a
plan-level concat, and the window's partitionBy shuffle happens either way.

At 100 TB the window shuffle on ``key`` is the dominant cost; callers that
chain several operators over the same key should apply them in one pass (the
frame is already hash-partitioned by key after the first window, and Catalyst
reuses the exchange for subsequent windows with the same partitioning).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

KEY, TS, VAL = "key", "ts", "v"


def wspec(key: str | Sequence[str] = KEY, ts: str = TS,
          tiebreak: str | None = None) -> WindowSpec:
    """Per-key time-ordered window.  Pass ``tiebreak`` (any column giving a
    total order — e.g. doc_id, or the value column) when (key, ts) can hold
    duplicates: without it, duplicate-timestamp rows order arbitrarily per
    run/partitioning, making shift/diff/rank nondeterministic vs an oracle.
    (The engine's datagen guarantees unique ts; real feeds may not.)"""
    keys = [key] if isinstance(key, str) else list(key)
    order = [ts] if tiebreak is None else [ts, tiebreak]
    return Window.partitionBy(*keys).orderBy(*order)


def w_rows(n: int, key: str | Sequence[str] = KEY, ts: str = TS,
           tiebreak: str | None = None) -> WindowSpec:
    """Trailing count-n frame over *valid* rows (caller pre-filters nulls)."""
    return wspec(key, ts, tiebreak).rowsBetween(-(n - 1), Window.currentRow)


def w_unbounded(key: str | Sequence[str] = KEY, ts: str = TS,
                tiebreak: str | None = None) -> WindowSpec:
    return wspec(key, ts, tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )


def apply_on_valid(
    df: DataFrame,
    out: str,
    expr: Column,
    v: str = VAL,
    keep_null_rows: bool = True,
) -> DataFrame:
    """Evaluate ``expr`` (a window expression) over the null-filtered frame and
    union the null rows back with NULL output — the NaN-skip identity."""
    valid = df.filter(F.col(v).isNotNull()).withColumn(out, expr)
    if not keep_null_rows:
        return valid
    nulls = df.filter(F.col(v).isNull()).withColumn(
        out, F.lit(None).cast(valid.schema[out].dataType)
    )
    return valid.unionByName(nulls)


def gated(expr: Column, count_expr: Column, n: int) -> Column:
    """Emission gate: output NULL until n valid observations are in the window
    (reference gates on t0 >= n, _rolling.py:462)."""
    return F.when(count_expr >= n, expr)
