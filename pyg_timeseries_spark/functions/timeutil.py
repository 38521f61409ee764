"""Timezone-safe microsecond arithmetic for timestamp columns.

Spark's ``timestamp_diff`` converts TIMESTAMP_NTZ operands through the
session timezone (measured on 4.1.2: an NTZ wall time inside a DST
spring-forward gap shifts by the gap width under that zone's session),
while ``hour``/``minute``/``date_part``/``to_date``/``datediff`` and
``timestamp_add`` operate on NTZ components and are TZ-free.  So the safe
µs-since-epoch for NTZ is component arithmetic — days·86400e6 + h·3600e6 +
m·60e6 + fractional-second·1e6 — and for TIMESTAMP (with zone), where
absolute time IS the semantics, ``unix_micros`` gives the instant's µs
since the UTC epoch with no session-timezone dependence.  Bucket anchoring
is therefore UTC-anchored for TIMESTAMP and wall-clock-anchored for NTZ,
in any session zone.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

US_DAY = 86_400_000_000


def ntz_epoch_us(col: Column) -> Column:
    """µs since 1970-01-01 of the column's wall-clock components —
    TZ-free for NTZ under any session timezone (DST gaps included)."""
    days = F.datediff(F.to_date(col), F.lit("1970-01-01").cast("date")).cast("long")
    frac_us = (F.date_part(F.lit("SECOND"), col) * 1_000_000).cast("long")
    return (
        days * F.lit(US_DAY)
        + F.hour(col).cast("long") * F.lit(3_600_000_000)
        + F.minute(col).cast("long") * F.lit(60_000_000)
        + frac_us
    )


def ts_us(df: DataFrame, ts: str) -> Column:
    """µs-since-epoch of ``df[ts]``: component-based for NTZ (TZ-free),
    instant-based for TIMESTAMP (absolute-time semantics)."""
    t = df.schema[ts].dataType
    if isinstance(t, TimestampNTZType):
        return ntz_epoch_us(F.col(ts))
    # unix_micros is the instant's µs since the UTC epoch — independent of
    # the session timezone (an epoch LITERAL cast to timestamp would be
    # interpreted in the session zone and shift bucket anchoring under
    # e.g. half-hour-offset zones)
    return F.unix_micros(F.col(ts))


def us_expr_for_type(dtype) -> "callable":
    """Like :func:`ts_us` but returns an expression builder for any column
    of the given type (e.g. a struct field)."""
    if isinstance(dtype, TimestampNTZType):
        return ntz_epoch_us
    return F.unix_micros


def py_epoch_us(stamp: str) -> int:
    """Driver-side µs since epoch of a wall-clock string (calendar math,
    no timezone)."""
    fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in stamp else (
        "%Y-%m-%d %H:%M:%S" if ":" in stamp else "%Y-%m-%d"
    )
    dt = datetime.strptime(stamp, fmt)
    delta = dt - datetime(1970, 1, 1)
    # exact integer arithmetic — total_seconds() is a double whose
    # resolution at 2^31-second magnitudes is ~0.5µs (found by hypothesis)
    return (
        delta.days * US_DAY + delta.seconds * 1_000_000 + delta.microseconds
    )
