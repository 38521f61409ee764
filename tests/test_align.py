"""align_series — the df_concat(join=…, method=…) alignment semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators.align import align_series


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("a", "2024-01-01 00:00", 1.0),
        ("a", "2024-01-01 00:02", 2.0),
        ("a", "2024-01-01 00:03", 3.0),
        ("b", "2024-01-01 00:01", 10.0),
        ("b", "2024-01-01 00:03", 30.0),
    ]
    pdf = pd.DataFrame(rows, columns=["key", "ts", "v"]).assign(
        ts=lambda d: pd.to_datetime(d.ts)
    )
    return spark.createDataFrame(pdf).persist()


def _pivot(df):
    pdf = df.toPandas()
    return pdf.pivot_table(index="ts", columns="key", values="v",
                           dropna=False, sort=True)


def test_outer_union_axis(series):
    out = align_series(series, join="outer", method=None)
    p = _pivot(out)
    assert len(p) == 4  # union of the four distinct timestamps
    assert pd.isna(p.loc[pd.Timestamp("2024-01-01 00:01"), "a"])
    assert pd.isna(p.loc[pd.Timestamp("2024-01-01 00:00"), "b"])
    assert p.loc[pd.Timestamp("2024-01-01 00:03"), "b"] == 30.0


def test_outer_ffill_carries_as_of(series):
    out = align_series(series, join="outer", method="ffill")
    p = _pivot(out)
    assert p.loc[pd.Timestamp("2024-01-01 00:01"), "a"] == 1.0  # carried
    assert p.loc[pd.Timestamp("2024-01-01 00:02"), "b"] == 10.0  # carried
    assert pd.isna(p.loc[pd.Timestamp("2024-01-01 00:00"), "b"])  # pre-first


def test_inner_intersection_axis(series):
    out = align_series(series, join="inner", method=None)
    p = _pivot(out)
    assert list(p.index) == [pd.Timestamp("2024-01-01 00:03")]
    assert p.iloc[0].tolist() == [3.0, 30.0]


def test_align_plan_has_no_python(series):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        align_series(series, join="outer", method="ffill").explain("formatted")
    plan = buf.getvalue()
    assert "Window" in plan
    for bad in ("ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert bad not in plan, bad


def test_bad_args(series):
    with pytest.raises(ValueError):
        align_series(series, join="left")
    with pytest.raises(ValueError):
        align_series(series, method="bfill")
