"""align_series — the df_concat(join=…, method=…) alignment semantics."""

import numpy as np
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


# -- asof_join ---------------------------------------------------------------


def _tq(n=800, seed=41):
    """Trade/quote style pair of frames."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-05-01")
    trades = pd.DataFrame(
        {
            "key": [f"s{i % 3}" for i in range(n)],
            "ts": base + pd.to_timedelta(np.sort(rng.integers(0, 10**9, n)), unit="us"),
            "qty": rng.integers(1, 100, n).astype("int64"),
        }
    )
    quotes = pd.DataFrame(
        {
            "key": [f"s{i % 3}" for i in range(n // 2)],
            "ts": base + pd.to_timedelta(np.sort(rng.integers(0, 10**9, n // 2)), unit="us"),
            "px": rng.normal(100, 3, n // 2),
        }
    )
    # drop duplicate (key, ts) so pandas/duckdb/spark tie rules can't differ
    trades = trades.drop_duplicates(["key", "ts"])
    quotes = quotes.drop_duplicates(["key", "ts"])
    return trades, quotes


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas(spark, direction):
    import pandas as pd

    from pyg_timeseries_spark.operators.align import asof_join

    trades, quotes = _tq()
    got = (
        asof_join(
            spark.createDataFrame(trades), spark.createDataFrame(quotes),
            direction=direction,
        )
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        trades.sort_values("ts"),
        quotes.sort_values("ts").rename(columns={"px": "px_r"}),
        on="ts", by="key", direction=direction,
    ).sort_values(["key", "ts"]).reset_index(drop=True)
    assert (got["qty"] == exp["qty"]).all()
    assert got["px_r"].isna().equals(exp["px_r"].isna())
    assert np.allclose(got["px_r"].dropna(), exp["px_r"].dropna(), atol=0)


def test_asof_join_tolerance(spark):
    import pandas as pd

    from pyg_timeseries_spark.operators.align import asof_join

    trades, quotes = _tq()
    tol = 5.0
    got = (
        asof_join(
            spark.createDataFrame(trades), spark.createDataFrame(quotes),
            tolerance_s=tol,
        )
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        trades.sort_values("ts"),
        quotes.sort_values("ts").rename(columns={"px": "px_r"}),
        on="ts", by="key", direction="backward",
        tolerance=pd.Timedelta(seconds=tol),
    ).sort_values(["key", "ts"]).reset_index(drop=True)
    assert got["px_r"].isna().equals(exp["px_r"].isna())
    assert np.allclose(got["px_r"].dropna(), exp["px_r"].dropna(), atol=0)


def test_asof_join_same_ts_inclusive(spark):
    """A right row AT the left timestamp matches in backward mode."""
    import pandas as pd

    from pyg_timeseries_spark.operators.align import asof_join

    t = pd.Timestamp("2024-01-01 12:00:00")
    left = pd.DataFrame({"key": ["a"], "ts": [t], "qty": [1]})
    right = pd.DataFrame({"key": ["a"], "ts": [t], "px": [99.5]})
    r = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right)
    ).first()
    assert r["px_r"] == 99.5 and str(r["__asof_ts"]) == str(t)


def test_asof_join_single_window_pass(spark):
    from pyg_timeseries_spark.operators.align import asof_join

    trades, quotes = _tq(100)
    plan = (
        asof_join(spark.createDataFrame(trades), spark.createDataFrame(quotes))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange") <= 2  # two inputs union into one shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_asof_join_rejects_colliding_left_columns(spark):
    import pandas as pd
    import pytest as _pt

    l = spark.createDataFrame(pd.DataFrame(
        {"key": ["a"], "ts": pd.to_datetime(["2024-01-01"]), "px_r": [1.0]}))
    r = spark.createDataFrame(pd.DataFrame(
        {"key": ["a"], "ts": pd.to_datetime(["2024-01-01"]), "px": [2.0]}))
    from pyg_timeseries_spark.operators.align import asof_join

    with _pt.raises(ValueError, match="collide"):
        asof_join(l, r)
    l2 = l.withColumnRenamed("px_r", "__rv")
    with _pt.raises(ValueError, match="collide"):
        asof_join(l2, r)
