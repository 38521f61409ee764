"""Scalable interval (range-containment) join: attach each point row to the
interval rows that contain it, without the broadcast-nested-loop plan
Catalyst produces for a raw ``start <= ts AND ts <= end`` join.

Strategy (the standard time-binning range join, as in Databricks' range-join
binning and the interval-join of stream processors): both sides map to
``bucket_s``-wide integer time bins — a point lands in exactly one bin, an
interval EXPLODES into every bin it overlaps (``sequence(floor(lo),
floor(hi))``) — then an equi-join on (key, bin) followed by the exact
containment filter.  The shuffle is a plain hash join on (key, bin); work
scales with points + intervals × (interval_width / bucket_s + 1), so pick
``bucket_s`` near the typical interval width.  No cartesian, no BNLJ (plan
asserted in tests).

Bin values come from floor(epoch-µs / width): epoch-µs via
functions/timeutil.py (NTZ-safe, no session-timezone routing), and the
binning map is MONOTONE, so containment can never straddle a bin — a
point's bin always lies within its interval's exploded bin range.  (The
float division is exact for |epoch µs| < 2^53 ≈ year 2255; and even past
that, monotonicity keeps the join correct.)  Inverted rows
(start > end) contain nothing and are dropped before the explode.

Reference scope note: the reference engine has no two-table joins at all
(its only "join" is index alignment — SURVEY.md §2.8); this operator extends
the engine the same way asof_join does, for the event-to-session/window
assignment step of pipeline builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyg_timeseries_spark.functions.timeutil import us_expr_for_type


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str = "key",
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_s: float = 3600.0,
    point_cols: list[str] | None = None,
    interval_cols: list[str] | None = None,
) -> DataFrame:
    """Inner-join ``points`` to every ``intervals`` row with
    ``start <= ts <= end`` on the same ``key`` (closed interval).

    Returns the point's (key, ts, *point_cols) plus the matched interval's
    (start, end, *interval_cols); a point inside k overlapping intervals
    yields k rows, a point inside none yields nothing (inner semantics).
    """
    w_us = int(bucket_s * 1_000_000)
    if w_us <= 0:
        raise ValueError(f"bucket_s must be positive, got {bucket_s}")
    pcols = point_cols if point_cols is not None else [
        c for c in points.columns if c not in (key, ts)
    ]
    icols = interval_cols if interval_cols is not None else [
        c for c in intervals.columns if c not in (key, start, end)
    ]
    clashes = ({ts, "__bin"} | set(pcols)) & ({start, end} | set(icols))
    if clashes:
        raise ValueError(
            f"interval_join output would collide on {sorted(clashes)}; "
            "pass point_cols/interval_cols or rename"
        )

    p_us = us_expr_for_type(points.schema[ts].dataType)
    lo_us = us_expr_for_type(intervals.schema[start].dataType)
    hi_us = us_expr_for_type(intervals.schema[end].dataType)

    p = points.select(
        F.col(key).alias(key), F.col(ts).alias(ts), *pcols,
        F.floor(p_us(F.col(ts)) / w_us).alias("__bin"),
    )
    i = intervals.filter(F.col(start) <= F.col(end)).select(
        F.col(key).alias(key), F.col(start).alias(start),
        F.col(end).alias(end), *icols,
        F.explode(
            F.sequence(
                F.floor(lo_us(F.col(start)) / w_us),
                F.floor(hi_us(F.col(end)) / w_us),
            )
        ).alias("__bin"),
    )
    joined = p.join(i, [key, "__bin"]).filter(
        (F.col(start) <= F.col(ts)) & (F.col(ts) <= F.col(end))
    )
    return joined.select(key, ts, *pcols, start, end, *icols)
