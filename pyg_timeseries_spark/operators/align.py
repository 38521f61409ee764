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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = KEY,
    ts: str = TS,
    right_cols: list[str] | None = None,
    tolerance_s: float | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: attach to every left row the temporally nearest right
    row per key — ``backward`` takes the latest right row at-or-before the
    left timestamp, ``forward`` the earliest at-or-after.  ``tolerance_s``
    voids matches farther than that many seconds.

    Spark-first shape (100 TB-safe): NOT a range join (which Catalyst
    plans as a broadcast-nested-loop with per-row scans) but a union +
    single per-key window pass — right rows sort immediately BEFORE left
    rows at equal timestamps, so ``last(..., ignorenulls)`` over the
    running frame is exactly the as-of match.  One shuffle on the key,
    O(n log n) total, same cost class as one window operator.

    Matched columns come back as ``<col><suffix>`` plus ``__asof_ts``
    (the matched right timestamp, NULL when no match / out of tolerance).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction}")
    rcols = right_cols or [c for c in right.columns if c not in (key, ts)]
    # guard the internal temp names and the suffixed output names — a left
    # frame already carrying them would silently produce duplicate or
    # ambiguous output columns
    clashes = {"__side", "__rv", "__m", "__asof_ts"} & set(left.columns)
    clashes |= {f"{c}{suffix}" for c in rcols} & set(left.columns)
    if clashes:
        raise ValueError(
            f"asof_join output would collide with left columns "
            f"{sorted(clashes)}; rename them or pass a different suffix"
        )

    payload = F.struct(
        F.col(ts).alias("__t"), *[F.col(c).alias(c) for c in rcols]
    )
    r = right.select(
        F.col(key).alias(key),
        F.col(ts).alias(ts),
        F.lit(0).alias("__side"),
        payload.alias("__rv"),
    )
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__rv", F.lit(None).cast(r.schema["__rv"].dataType)
    )
    u = l.select(*left.columns, "__side", "__rv").unionByName(
        r.select(*[F.lit(None).cast(left.schema[c].dataType).alias(c)
                   for c in left.columns if c not in (key, ts)],
                 key, ts, "__side", "__rv"),
        allowMissingColumns=False,
    )
    # ties among right rows at the same (key, ts) break to the LARGEST
    # payload struct — deterministic under any partitioning
    if direction == "backward":
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc(), F.col("__side").asc(),
                     F.col("__rv").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).desc(), F.col("__side").asc(),
                     F.col("__rv").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    matched = F.last("__rv", ignorenulls=True).over(w)
    out = (
        u.withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .drop("__side", "__rv")
    )
    from pyg_timeseries_spark.functions.timeutil import us_expr_for_type

    # NTZ-safe gap (timestamp_diff shifts NTZ wall times through the
    # session zone's DST gaps — functions/timeutil.py)
    us_of = us_expr_for_type(left.schema[ts].dataType)
    gap_us = F.abs(us_of(F.col("__m.__t")) - us_of(F.col(ts)))
    ok = F.col("__m").isNotNull()
    if tolerance_s is not None:
        ok = ok & (gap_us <= F.lit(int(tolerance_s * 1_000_000)))
    cols = list(left.columns) + [
        F.when(ok, F.col("__m.__t")).alias("__asof_ts")
    ] + [F.when(ok, F.col(f"__m.{c}")).alias(f"{c}{suffix}") for c in rcols]
    return out.select(*cols)
