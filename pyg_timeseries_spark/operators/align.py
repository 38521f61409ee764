"""Multi-series time alignment — the engine's rendition of the reference's
``df_concat(join='outer'/'inner', method='ffill')`` (pyg_base, used at
/root/reference/src/pyg_timeseries/_ewm.py:554,701,835 and
_multibuffer.py:274-281): align every series onto a common time axis,
optionally forward-filling gaps.

Long-format rendition: the input is ONE frame (key, ts, v) holding all
series; the output is the same shape on the aligned axis —

* ``join='outer'``  — the union of every key's timestamps;
* ``join='inner'``  — only timestamps where EVERY key has an observation;
* ``method='ffill'`` — each key carries its latest at-or-before value onto
  axis timestamps it lacks; ``method=None`` leaves NULL.

Plan shape (100 TB-safe): distinct-ts ⨯ distinct-keys grid, one left join
on (key, ts), one per-key window for the fill — no UDF, no driver state.
The grid cross-join is |axis| × |keys| rows, exactly the aligned output
size the caller asked for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators._core import KEY, TS, VAL as V


def align_series(
    df: DataFrame,
    join: str = "outer",
    method: str | None = None,
    key: str = KEY,
    ts: str = TS,
    v: str = V,
) -> DataFrame:
    """Align all keys of a long (key, ts, v) frame onto a common axis.
    Returns (key, ts, v) with one row per (axis timestamp, key)."""
    if join == "outer":
        axis = df.select(ts).distinct()
    elif join == "inner":
        # lazy: the total key count rides along as a broadcast 1-row frame
        # instead of an eager .count() action at plan-construction time
        total = df.select(F.count_distinct(key).alias("_nk"))
        axis = (
            df.groupBy(ts)
            .agg(F.count_distinct(key).alias("_k"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("_k") == F.col("_nk"))
            .select(ts)
        )
    else:
        raise ValueError(f"join must be 'outer' or 'inner', got {join!r}")
    grid = axis.crossJoin(df.select(key).distinct())
    out = grid.join(df, on=[key, ts], how="left")
    if method is None:
        return out.select(key, ts, v)
    if method != "ffill":
        raise ValueError(f"method must be None or 'ffill', got {method!r}")
    w = (
        Window.partitionBy(key).orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.select(
        key, ts, F.last(v, ignorenulls=True).over(w).alias(v)
    )
