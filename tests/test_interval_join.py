"""Binned interval join: equals the naive range join, never plans a
BroadcastNestedLoopJoin / CartesianProduct."""

import contextlib
import io

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators.interval_join import interval_join


def _fixture(spark, seed=11):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {
            "key": [f"k{i % 3}" for i in range(300)],
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 48 * 3600, 300), unit="s"),
            "v": rng.normal(size=300),
        }
    )
    iv_rows = []
    for k in range(3):
        t = pd.Timestamp("2024-01-01")
        for j in range(8):
            t += pd.Timedelta(seconds=int(rng.integers(600, 4 * 3600)))
            lo = t
            hi = t + pd.Timedelta(seconds=int(rng.integers(300, 5 * 3600)))
            iv_rows.append((f"k{k}", lo, hi, f"iv{k}_{j}"))
            t = hi  # overlapping and disjoint mix via next lo jump
    ivs = pd.DataFrame(iv_rows, columns=["key", "start", "end", "label"])
    return spark.createDataFrame(pts), spark.createDataFrame(ivs)


def test_matches_naive_range_join(spark):
    pts, ivs = _fixture(spark)
    got = interval_join(pts, ivs, bucket_s=1800.0)
    naive = (
        pts.alias("p")
        .join(ivs.alias("i"), on="key")
        .filter(
            (F.col("i.start") <= F.col("p.ts"))
            & (F.col("p.ts") <= F.col("i.end"))
        )
        .select("key", "ts", "v", "start", "end", "label")
    )
    assert got.count() == naive.count() > 0
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_bucket_width_invariance(spark):
    pts, ivs = _fixture(spark)
    a = interval_join(pts, ivs, bucket_s=600.0)
    b = interval_join(pts, ivs, bucket_s=7200.0)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_no_nested_loop_plan(spark):
    pts, ivs = _fixture(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        interval_join(pts, ivs).explain()
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_collision_guard(spark):
    import pytest

    pts, ivs = _fixture(spark)
    with pytest.raises(ValueError, match="collide"):
        interval_join(pts.withColumnRenamed("v", "label"), ivs)
