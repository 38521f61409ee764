"""KMV distinct sketch: exactness below k, estimator accuracy, and the
continuous-aggregate invariant — merging fine-tier sketches equals
sketching the raw union, element for element."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.functions.sketches import (
    KMV_SPACE,
    kmv_estimate,
    kmv_hash,
    kmv_merge,
    kmv_sketch,
)


def _events(spark, n_rows=5000, n_sources=3, n_users=700, seed=7):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "source": [f"s{i % n_sources}" for i in range(n_rows)],
            "ts": pd.date_range("2024-01-01", periods=n_rows, freq="90s"),
            "user_id": rng.integers(0, n_users, n_rows),
        }
    )
    return spark.createDataFrame(pdf)


def test_kmv_hash_matches_reference_md5(spark):
    out = spark.range(1).select(kmv_hash(F.lit("42")).alias("h")).first()["h"]
    expected = int(hashlib.md5(b"42|kmv").hexdigest()[:15], 16)
    assert out == expected


def test_kmv_exact_below_k(spark):
    ev = _events(spark, n_rows=400, n_users=30)
    sk = kmv_sketch(ev, ["source"], "user_id", k=64)
    got = {
        r["source"]: (len(r["kmv"]), r["est"])
        for r in sk.select(
            "source", "kmv", kmv_estimate(F.col("kmv"), 64).alias("est")
        ).collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in ev.groupBy("source")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for s, n in exact.items():
        assert n < 64
        assert got[s] == (n, float(n))


def test_kmv_estimate_accuracy(spark):
    ev = _events(spark, n_rows=20000, n_users=3000, n_sources=1)
    k = 256
    sk = kmv_sketch(ev, ["source"], "user_id", k=k)
    est = sk.select(kmv_estimate(F.col("kmv"), k).alias("e")).first()["e"]
    exact = ev.select("user_id").distinct().count()
    # relative error ~1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est - exact) / exact < 4 / np.sqrt(k - 2)


def test_kmv_sketch_sorted_and_bounded(spark):
    ev = _events(spark)
    k = 16
    rows = kmv_sketch(ev, ["source"], "user_id", k=k).collect()
    for r in rows:
        arr = r["kmv"]
        assert len(arr) <= k
        assert arr == sorted(arr)
        assert len(set(arr)) == len(arr)
        assert all(0 <= h < KMV_SPACE for h in arr)


@pytest.mark.parametrize("k", [8, 64])
def test_kmv_cascade_merge_equals_direct(spark, k):
    """(source, 1m) sketches merged to 1h, then to 1d == sketching raw
    directly at each tier — the continuous-aggregate contract."""
    ev = _events(spark, n_rows=4000)
    tiers = {
        "1m": F.date_trunc("minute", F.col("ts")),
        "1h": F.date_trunc("hour", F.col("ts")),
        "1d": F.date_trunc("day", F.col("ts")),
    }

    def direct(unit):
        return kmv_sketch(
            ev.withColumn("bucket", tiers[unit]), ["source", "bucket"],
            "user_id", k=k,
        )

    def as_map(df):
        return {
            (r["source"], r["bucket"]): list(r["kmv"]) for r in df.collect()
        }

    m1 = direct("1m")
    h1 = kmv_merge(
        m1.withColumn("bucket", F.date_trunc("hour", F.col("bucket"))),
        ["source", "bucket"], k=k,
    )
    d1 = kmv_merge(
        h1.withColumn("bucket", F.date_trunc("day", F.col("bucket"))),
        ["source", "bucket"], k=k,
    )
    assert as_map(h1) == as_map(direct("1h"))
    assert as_map(d1) == as_map(direct("1d"))


def test_kmv_merge_dedups_shared_ids(spark):
    """The same id appearing in two children must count once after merge."""
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 6,
            "sub": [1, 1, 1, 2, 2, 2],
            "id": [10, 11, 12, 10, 11, 13],  # 10,11 shared
        }
    )
    df = spark.createDataFrame(pdf)
    subs = kmv_sketch(df, ["g", "sub"], "id", k=64)
    merged = kmv_merge(subs.drop("sub"), ["g"], k=64)
    arr = merged.first()["kmv"]
    assert len(arr) == 4  # ids {10,11,12,13}
