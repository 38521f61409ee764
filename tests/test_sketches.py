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
    bottomk_merge,
    bottomk_quantile,
    bottomk_sample,
    cms_merge,
    cms_position,
    cms_query,
    cms_sketch,
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


# -- count-min ---------------------------------------------------------------


def _words(spark, n_rows=3000, vocab=40, n_sources=3, seed=11):
    rng = np.random.default_rng(seed)
    # zipf-ish skew so some items are heavy
    items = (rng.zipf(1.6, n_rows) % vocab).astype(int)
    pdf = pd.DataFrame(
        {
            "source": [f"s{i % n_sources}" for i in range(n_rows)],
            "ts": pd.date_range("2024-01-01", periods=n_rows, freq="45s"),
            "item": [f"w{i}" for i in items],
        }
    )
    return spark.createDataFrame(pdf)


def test_cms_position_md5(spark):
    out = spark.range(1).select(
        cms_position(F.lit("tok"), 2, 64).alias("p")
    ).first()["p"]
    expected = int(hashlib.md5(b"tok|cms2").hexdigest()[:15], 16) % 64
    assert out == expected


def test_cms_point_query_bounds(spark):
    """CMS never underestimates, and with width >> vocab it is exact."""
    df = _words(spark, vocab=30)
    depth, width = 4, 256
    sk = cms_sketch(df, ["source"], "item", depth=depth, width=width)
    exact = {
        (r["source"], r["item"]): r["n"]
        for r in df.groupBy("source", "item").agg(F.count("*").alias("n")).collect()
    }
    grids = {r["source"]: r["cms"] for r in sk.collect()}
    for (s, item), n in exact.items():
        est_row = (
            spark.range(1)
            .select(
                cms_query(
                    F.lit(grids[s]), F.lit(item), depth, width
                ).alias("e")
            )
            .first()
        )
        assert est_row["e"] >= n
    # width 256 >> 30 distinct items: no collisions expected in any row
    for (s, item), n in exact.items():
        est = (
            spark.range(1)
            .select(cms_query(F.lit(grids[s]), F.lit(item), depth, width).alias("e"))
            .first()["e"]
        )
        assert est == n


def test_cms_grid_total_per_row(spark):
    """Every depth row of the grid sums to the group's total weight."""
    df = _words(spark, n_rows=1200)
    depth, width = 3, 64
    sk = cms_sketch(df, ["source"], "item", depth=depth, width=width)
    totals = {
        r["source"]: r["n"]
        for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for r in sk.collect():
        grid = r["cms"]
        assert len(grid) == depth * width
        for j in range(depth):
            assert sum(grid[j * width : (j + 1) * width]) == totals[r["source"]]


def test_cms_cascade_merge_equals_direct(spark):
    df = _words(spark, n_rows=4000)
    depth, width = 4, 32
    tiers = {
        "1m": F.date_trunc("minute", F.col("ts")),
        "1h": F.date_trunc("hour", F.col("ts")),
        "1d": F.date_trunc("day", F.col("ts")),
    }

    def direct(unit):
        return cms_sketch(
            df.withColumn("bucket", tiers[unit]),
            ["source", "bucket"], "item", depth=depth, width=width,
        )

    def as_map(d):
        return {(r["source"], r["bucket"]): list(r["cms"]) for r in d.collect()}

    m1 = direct("1m")
    h1 = cms_merge(
        m1.withColumn("bucket", F.date_trunc("hour", F.col("bucket"))),
        ["source", "bucket"], depth=depth, width=width,
    )
    d1 = cms_merge(
        h1.withColumn("bucket", F.date_trunc("day", F.col("bucket"))),
        ["source", "bucket"], depth=depth, width=width,
    )
    assert as_map(h1) == as_map(direct("1h"))
    assert as_map(d1) == as_map(direct("1d"))


def test_cms_weighted(spark):
    pdf = pd.DataFrame(
        {"g": ["a", "a", "a"], "item": ["x", "x", "y"], "w": [5, 2, 3]}
    )
    df = spark.createDataFrame(pdf)
    depth, width = 2, 128
    sk = cms_sketch(df, ["g"], "item", depth=depth, width=width, weight_col="w")
    grid = sk.first()["cms"]
    est_x = (
        spark.range(1)
        .select(cms_query(F.lit(grid), F.lit("x"), depth, width).alias("e"))
        .first()["e"]
    )
    est_y = (
        spark.range(1)
        .select(cms_query(F.lit(grid), F.lit("y"), depth, width).alias("e"))
        .first()["e"]
    )
    assert (est_x, est_y) == (7, 3)


# -- bottom-k sample / quantiles --------------------------------------------


def _docs(spark, n=300, n_sources=3, seed=5):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "source": [f"s{i % n_sources}" for i in range(n)],
            "ts": pd.date_range("2024-01-01", periods=n, freq="20min"),
            "doc_id": [f"d{i}" for i in range(n)],
            "n_chars": rng.integers(50, 5000, n).astype(float),
        }
    )
    return spark.createDataFrame(pdf)


def test_bottomk_exact_below_k(spark):
    """n < k: the sample is the population, quantiles are exact
    nearest-rank quantiles."""
    df = _docs(spark, n=90)  # 30 per source < k=64
    sk = bottomk_sample(df, ["source"], "doc_id", "n_chars", k=64)
    out = {
        r["source"]: (len(r["sample"]), r["q50"], r["q90"])
        for r in sk.select(
            "source",
            "sample",
            bottomk_quantile(F.col("sample"), 0.5).alias("q50"),
            bottomk_quantile(F.col("sample"), 0.9).alias("q90"),
        ).collect()
    }
    pdf = df.toPandas()
    for s, grp in pdf.groupby("source"):
        vals = sorted(grp["n_chars"])
        n = len(vals)
        exp_q50 = vals[max(1, int(np.ceil(0.5 * n))) - 1]
        exp_q90 = vals[max(1, int(np.ceil(0.9 * n))) - 1]
        assert out[s] == (n, exp_q50, exp_q90)


def test_bottomk_cascade_merge_equals_direct(spark):
    df = _docs(spark, n=400)
    k = 16
    tiers = {
        "1h": F.date_trunc("hour", F.col("ts")),
        "1d": F.date_trunc("day", F.col("ts")),
    }

    def direct(unit):
        return bottomk_sample(
            df.withColumn("bucket", tiers[unit]),
            ["source", "bucket"], "doc_id", "n_chars", k=k,
        )

    def as_map(d):
        return {
            (r["source"], r["bucket"]): [(e["h"], e["v"]) for e in r["sample"]]
            for r in d.collect()
        }

    h1 = direct("1h")
    d1 = bottomk_merge(
        h1.withColumn("bucket", F.date_trunc("day", F.col("bucket"))),
        ["source", "bucket"], k=k,
    )
    assert as_map(d1) == as_map(direct("1d"))


def test_bottomk_quantile_accuracy(spark):
    """Full population vs k=256 sample: median within sampling error."""
    df = _docs(spark, n=6000, n_sources=1)
    k = 256
    sk = bottomk_sample(df, ["source"], "doc_id", "n_chars", k=k)
    q50 = sk.select(bottomk_quantile(F.col("sample"), 0.5).alias("q")).first()["q"]
    true_med = np.median(df.toPandas()["n_chars"])
    # value-space tolerance: uniform 50..5000, rank error ~4/sqrt(k) of n
    assert abs(q50 - true_med) / true_med < 0.25


def test_bottomk_sample_is_hash_prefix(spark):
    """The kept ids are exactly the k smallest hashes — not arbitrary."""
    df = _docs(spark, n=200, n_sources=1)
    k = 20
    sk = bottomk_sample(df, ["source"], "doc_id", "n_chars", k=k)
    kept = [e["h"] for e in sk.first()["sample"]]
    all_h = sorted(
        int(hashlib.md5(f"d{i}|bk".encode()).hexdigest()[:15], 16)
        for i in range(200)
    )
    assert kept == all_h[:k]


def test_cms_merge_preserves_all_zero_groups(spark):
    """A key whose merged grid is entirely zero must come back as a zero
    grid, not vanish from the merge output."""
    import pandas as pd

    from pyg_timeseries_spark.functions.sketches import cms_merge

    depth, width = 2, 4
    zero = [0] * (depth * width)
    grid = [0, 3, 0, 0, 0, 0, 1, 0]
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["empty", "busy"], "cms": [zero, grid]})
    )
    out = {r["k"]: list(r["cms"]) for r in cms_merge(df, ["k"], depth, width).collect()}
    assert out["busy"] == grid
    assert out["empty"] == zero


def test_cms_merge_null_key_group_keeps_counts(spark):
    """NULL-key groups must keep their real merged counts (null-safe
    restoration join), not get zeroed."""
    import pandas as pd

    from pyg_timeseries_spark.functions.sketches import cms_merge

    depth, width = 2, 4
    grid = [1, 0, 0, 0, 0, 2, 0, 0]
    df = spark.createDataFrame(
        pd.DataFrame({"k": [None, "x"], "cms": [grid, grid]})
    )
    out = {r["k"]: list(r["cms"]) for r in cms_merge(df, ["k"], depth, width).collect()}
    assert out[None] == grid and out["x"] == grid
