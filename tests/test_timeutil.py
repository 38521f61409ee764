"""Property tests for the TZ-safe microsecond arithmetic
(functions/timeutil.py): component epoch == python datetime epoch for
arbitrary wall times at microsecond resolution, NTZ and LTZ paths agree
under a UTC session, and py_epoch_us parses every accepted format."""

from datetime import datetime

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyg_timeseries_spark.functions.timeutil import (
    ntz_epoch_us,
    py_epoch_us,
    ts_us,
)

_dt = st.datetimes(
    min_value=datetime(1970, 1, 1),
    max_value=datetime(2100, 1, 1),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_dt, min_size=1, max_size=8))
def test_ntz_epoch_us_matches_python(spark, dts):
    stamps = [d.strftime("%Y-%m-%d %H:%M:%S.%f") for d in dts]
    df = spark.createDataFrame(pd.DataFrame({"s": stamps})).withColumn(
        "ts", F.to_timestamp_ntz("s")
    )
    got = [r["us"] for r in
           df.select(ntz_epoch_us(F.col("ts")).alias("us")).orderBy("s").collect()]
    def _us(d):
        delta = d - datetime(1970, 1, 1)
        return (delta.days * 86_400_000_000 + delta.seconds * 1_000_000
                + delta.microseconds)

    exp = [_us(d) for d in sorted(dts)]
    # formatting sorts identically to datetime sorting (fixed-width ISO)
    assert got == exp


def test_ts_us_ltz_equals_ntz_under_utc(spark):
    stamps = ["2024-03-10 02:30:45.123456", "1999-12-31 23:59:59.999999",
              "2024-11-03 01:30:00"]
    pdf = pd.DataFrame({"s": stamps})
    ntz = spark.createDataFrame(pdf).withColumn("ts", F.to_timestamp_ntz("s"))
    ltz = spark.createDataFrame(pdf).withColumn(
        "ts", F.to_timestamp("s")
    )
    a = [r[0] for r in ntz.select(ts_us(ntz, "ts")).orderBy("s").collect()]
    b = [r[0] for r in ltz.select(ts_us(ltz, "ts")).orderBy("s").collect()]
    assert a == b
    assert a == [py_epoch_us(s) for s in sorted(stamps)]


def test_py_epoch_us_formats():
    assert py_epoch_us("1970-01-01") == 0
    assert py_epoch_us("1970-01-01 00:00:01") == 1_000_000
    assert py_epoch_us("1970-01-02 00:00:00.000001") == 86_400_000_000 + 1
