"""Clock semantics (same-time-unit replace, gap-scaled decay) and late-data
bucket backfill in the rollup store."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyg_timeseries_spark.datagen import sequences
from pyg_timeseries_spark.kernels import ewm_numpy as K
from pyg_timeseries_spark.plans.checkpoint import RollupStore


def test_ewma_same_bucket_replace():
    """Within one time unit the LAST observation replaces the previous
    contribution (reference _ewm.py:41-44): feeding [x, y] in one bucket
    equals feeding just [y]."""
    a1 = np.array([1.0, 5.0, 2.0, 3.0])
    t1 = np.array([0.0, 1.0, 1.0, 2.0])  # rows 1,2 share bucket 1
    a2 = np.array([1.0, 2.0, 3.0])
    t2 = np.array([0.0, 1.0, 2.0])
    res1, s1 = K.ewma(a1, 10, time=t1)
    res2, s2 = K.ewma(a2, 10, time=t2)
    # final outputs and state agree: the 5.0 was replaced by 2.0
    assert res1[-1] == res2[-1]
    assert np.allclose(s1[1:4], s2[1:4])  # t0, t1 moments identical


def test_ewma_clock_gap_decay():
    """A clock gap of k units decays the state by w**k — equivalent to
    observing through k unit steps with no new data contribution between."""
    a = np.array([1.0, 2.0])
    t_gap = np.array([0.0, 3.0])
    res_gap, s = K.ewma(a, 10, time=t_gap)
    # manual: w = 10/11; after row0: t0 = (1-w), t1 = (1-w)*1
    w = 10 / 11
    t0 = (1 - w)
    t1 = (1 - w) * 1.0
    p = w ** 3
    t0 = t0 * p + (1 - w)
    t1 = t1 * p + (1 - w) * 2.0
    assert abs(res_gap[1] - t1 / t0) < 1e-15


def test_ewma_resume_mid_bucket():
    """Split INSIDE a time bucket: the engine's state carries the previous
    contribution (pv, pa), so the replace semantics survive the split."""
    a = np.array([1.0, 5.0, 2.0, 3.0])
    t = np.array([0.0, 1.0, 1.0, 2.0])
    full, _ = K.ewma(a, 10, time=t)
    head, s = K.ewma(a[:2], 10, time=t[:2])
    tail, _ = K.ewma(a[2:], 10, time=t[2:], state=s)
    assert np.array_equal(np.concatenate([head, tail]), full, equal_nan=True)


def test_late_bucket_backfill(spark, tmp_path):
    """A batch that back-fills a whole missing bucket region merges to the
    exact full-recompute result (bucket-level refresh)."""
    raw = sequences(spark, 20_000, with_tokens=True).persist()
    mid_lo = F.lit("2024-01-01 01:00:00").cast("timestamp")
    mid_hi = F.lit("2024-01-01 01:20:00").cast("timestamp")
    middle = raw.filter((F.col("ts") >= mid_lo) & (F.col("ts") < mid_hi))
    rest = raw.filter((F.col("ts") < mid_lo) | (F.col("ts") >= mid_hi))

    full_store = RollupStore(str(tmp_path / "f"), spark)
    full_tiers = full_store.ingest(raw)

    late_store = RollupStore(str(tmp_path / "l"), spark)
    late_store.ingest(rest)      # gap in the middle
    late_tiers = late_store.ingest(middle)  # late backfill

    for tier in ("1m", "1h", "1d"):
        a = full_tiers[tier].toPandas().sort_values(["source", "bucket"]).reset_index(drop=True)
        b = late_tiers[tier].toPandas().sort_values(["source", "bucket"]).reset_index(drop=True)
        for col in ("cnt", "sum_n_tok", "sum2_n_tok", "min_n_tok", "max_n_tok"):
            assert (a[col] == b[col]).all(), (tier, col)
    # default (chunked) token payloads: 1m buckets are entirely inside one
    # batch → the flattened read view is exact even under out-of-order
    # bucket arrival (bucket-level refresh)
    ta = full_store.read_tokens("1m").toPandas().sort_values(
        ["source", "bucket"]).reset_index(drop=True)
    tb = late_store.read_tokens("1m").toPandas().sort_values(
        ["source", "bucket"]).reset_index(drop=True)
    assert (ta["tokens"].apply(tuple) == tb["tokens"].apply(tuple)).all()


def test_diff_ratio_clock_golden_vectors(spark):
    """The reference's clock golden vectors (tests/test_ts_rolling.py:7-17):
    a = i², time = [0,0,1,1,1,2,2,2,2,3]."""
    import pandas as pd

    from pyg_timeseries_spark.operators.shift import diff, ratio

    a = 1.0 * np.arange(10) ** 2
    time = [0, 0, 1, 1, 1, 2, 2, 2, 2, 3]
    pdf = pd.DataFrame({
        "key": "k0",
        "ts": pd.date_range("2024-01-01", periods=10, freq="1min"),
        "v": a,
        "t": [float(x) for x in time],
    })
    df = spark.createDataFrame(pdf)

    got1 = diff(df, 1, time_col="t").toPandas().sort_values("ts")["diff"].to_numpy(float)
    exp1 = np.array([np.nan, np.nan, 4 - 1, 9 - 1, 16 - 1, 25 - 16, 36 - 16,
                     49 - 16, 64 - 16, 81 - 64])
    assert np.array_equal(got1, exp1, equal_nan=True)

    got2 = diff(df, 2, time_col="t").toPandas().sort_values("ts")["diff"].to_numpy(float)
    exp2 = np.array([np.nan] * 5 + [25 - 1, 36 - 1, 49 - 1, 64 - 1, 81 - 16])
    assert np.array_equal(got2, exp2, equal_nan=True)

    gotr = ratio(df, 1, time_col="t").toPandas().sort_values("ts")["ratio"].to_numpy(float)
    expr = np.array([np.nan, np.nan, 4 / 1, 9 / 1, 16 / 1, 25 / 16, 36 / 16,
                     49 / 16, 64 / 16, 81 / 64])
    assert np.allclose(gotr, expr, equal_nan=True, atol=0)


def test_interleaved_late_rows_exact_rebuild(spark, tmp_path):
    """Interleaving same-bucket late rows (batch 2's rows fall BETWEEN batch
    1's rows inside a bucket) break concat-order merging — exact_rebuild
    recomputes the overlapped buckets from retained raw, matching the full
    recompute bit-for-bit including token order."""
    raw = sequences(spark, 3000, with_tokens=True).persist()
    # batch 1: even seq rows; batch 2: odd seq rows (maximal interleaving)
    b1 = raw.filter(F.col("seq") % 2 == 0)
    b2 = raw.filter(F.col("seq") % 2 == 1)

    full_store = RollupStore(str(tmp_path / "f"), spark)
    full = full_store.ingest(raw)

    inc = RollupStore(str(tmp_path / "i"), spark)
    inc.ingest(b1, exact_rebuild=True)
    tiers = inc.ingest(b2, exact_rebuild=True)

    for tier in ("1m", "1h", "1d"):
        a = full[tier].toPandas().sort_values(["source", "bucket"]).reset_index(drop=True)
        b = tiers[tier].toPandas().sort_values(["source", "bucket"]).reset_index(drop=True)
        assert len(a) == len(b), tier
        for col in ("cnt", "sum_n_tok", "sum2_n_tok", "min_n_tok", "max_n_tok"):
            assert (a[col] == b[col]).all(), (tier, col)
        # default (chunked) token payloads re-chunk from retained raw —
        # the flattened view matches the full recompute at every tier
        ta = full_store.read_tokens(tier).toPandas().sort_values(
            ["source", "bucket"]).reset_index(drop=True)
        tb = inc.read_tokens(tier).toPandas().sort_values(
            ["source", "bucket"]).reset_index(drop=True)
        assert (ta["tokens"].apply(tuple) == tb["tokens"].apply(tuple)).all(), (
            f"token order diverged at {tier}"
        )
