"""Gap-based sessionization: assign events to sessions that close after
``gap_s`` seconds of per-key inactivity, plus per-session aggregates and a
Structured-Streaming rendition on Spark's native session windows.

Spark-first shape: the batch path is one per-key Window pass — a lag to
flag session starts, a running sum to number them — so the only shuffle is
the (key) partitioning both window functions share (Catalyst runs them in
a single Window operator).  At 100 TB the key space (users/sources) is
wide, so the shuffle is well spread; a single hot key degrades to one
task's sort, which is the same bound as any per-key sequential operator
here (plans/partitioning.py discusses the skew treatment).

The streaming rendition uses ``F.session_window`` with a watermark —
Spark's built-in merging session windows — and is asserted equal to the
batch assignment on finalized windows (tests/test_sessions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: float = 1800.0,
    out: str = "session_id",
) -> DataFrame:
    """Add ``out``: a per-key session ordinal (1-based) that increments
    whenever the gap since the key's previous event exceeds ``gap_s``
    seconds.  Deterministic under duplicate timestamps via a (ts, then
    full-row-arbitrary-free) ordering on ts alone — equal timestamps never
    open a gap, so their order cannot change the assignment."""
    from pyg_timeseries_spark.functions.timeutil import ts_us

    w = Window.partitionBy(key).orderBy(ts)
    # microsecond-exact and NTZ-safe under ANY session timezone: NTZ
    # columns use component µs (timestamp_diff would shift wall times
    # inside the session zone's DST gaps — functions/timeutil.py)
    us = ts_us(df, ts)
    prev_us = F.lag(us).over(w)
    new_sess = prev_us.isNull() | (
        (us - prev_us) > F.lit(int(gap_s * 1_000_000))
    )
    return df.withColumn(
        out,
        F.sum(new_sess.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: float = 1800.0,
) -> DataFrame:
    """Per (key, session): start, end, duration seconds, event count.
    One extra hash aggregate over the sessionized frame — partial/final
    combined, keyed on (key, session_id)."""
    s = sessionize(df, key=key, ts=ts, gap_s=gap_s)
    from pyg_timeseries_spark.functions.timeutil import us_expr_for_type

    agg = s.groupBy(key, "session_id").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    us_of = us_expr_for_type(df.schema[ts].dataType)
    return agg.withColumn(
        "duration_s",
        (us_of(F.col("session_end")) - us_of(F.col("session_start")))
        / F.lit(1_000_000.0),
    ).select(
        key, "session_id", "session_start", "session_end", "duration_s",
        "n_events",
    )


def session_window_counts(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Batch rendition on Spark's native merging session windows —
    semantically the same partition of each key's timeline as
    :func:`sessionize` (a window closes after ``gap`` of inactivity).
    Returns (key, window.start, window.end, n_events).  In batch this is
    a groupBy aggregate; the streaming form adds a watermark and emits
    finalized windows only."""
    return (
        df.groupBy(F.col(key), F.session_window(F.col(ts), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_session_counts(
    stream_df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming session counts: watermark + merging session windows.
    Append-mode emits a (key, window) row once the watermark passes the
    window end — late events inside the watermark re-merge windows before
    finalization, matching the batch assignment exactly."""
    return (
        stream_df.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def gap_stats(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    expected_s: float | None = None,
) -> DataFrame:
    """Per-key inter-arrival gap statistics — the series-completeness
    monitor: n_gaps, mean/min/max gap seconds, and (when ``expected_s`` is
    given) the fraction of gaps within 1.5× the expected cadence.  One
    key-partitioned window (the same microsecond-exact NTZ-safe diff as
    sessionize) plus one hash aggregate."""
    from pyg_timeseries_spark.functions.timeutil import ts_us

    w = Window.partitionBy(key).orderBy(ts)
    us = ts_us(df, ts)
    gap_us = us - F.lag(us).over(w)
    g = df.select(F.col(key).alias("key"), gap_us.alias("__g")).filter(
        F.col("__g").isNotNull()
    )
    aggs = [
        F.count(F.lit(1)).alias("n_gaps"),
        (F.avg("__g") / 1e6).alias("mean_gap_s"),
        (F.min("__g") / F.lit(1_000_000.0)).alias("min_gap_s"),
        (F.max("__g") / F.lit(1_000_000.0)).alias("max_gap_s"),
    ]
    if expected_s is not None:
        tol = int(expected_s * 1.5 * 1_000_000)
        aggs.append(
            F.avg((F.col("__g") <= tol).cast("double")).alias("on_cadence_frac")
        )
    return g.groupBy("key").agg(*aggs)
