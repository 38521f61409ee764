"""Segment-chained stateful execution == single sweep, bit-for-bit."""

import numpy as np
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators.ewm import ewma, ewma_, ewmstd_
from pyg_timeseries_spark.plans.partitioning import run_segmented, time_segments


def test_time_segments_cover(series_df):
    segs = time_segments(series_df, 4)
    assert len(segs) == 4
    assert segs[0][0] is None and segs[-1][1] is None


def _collect(df, out):
    pdf = df.toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    return pdf[out].to_numpy(float)


def test_segmented_ewma_bitexact(spark, series_df):
    full = _collect(ewma(series_df, 10), "ewma")
    seg_data, seg_state = run_segmented(series_df, ewma_, n_segments=5, n=10)
    seg = _collect(seg_data, "ewma")
    assert np.array_equal(full, seg, equal_nan=True)
    assert seg_state.count() == series_df.select("key").distinct().count()


def test_segmented_ewmstd_bitexact(spark, series_df):
    full_data, _ = ewmstd_(series_df, 10)
    full = _collect(full_data, "ewmstd")
    seg_data, _ = run_segmented(series_df, ewmstd_, n_segments=3, n=10)
    assert np.array_equal(full, _collect(seg_data, "ewmstd"), equal_nan=True)


def test_segmented_sparse_key_bitexact(spark, series_df):
    """A key with rows only at the head and tail of the range (absent from
    every middle segment) must carry its state across the empty segments —
    the ADVICE-r1 bug: state restart for keys absent from a segment."""
    import pandas as pd

    sparse = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": "sparse",
                "ts": [
                    pd.Timestamp("2024-01-01 00:00:00"),
                    pd.Timestamp("2024-01-01 00:01:00"),
                    pd.Timestamp("2024-01-01 04:58:00"),
                    pd.Timestamp("2024-01-01 04:59:00"),
                ],
                "v": [1.0, 2.0, 3.0, 4.0],
            }
        )
    )
    df = series_df.unionByName(sparse)
    full = _collect(ewma(df, 10), "ewma")
    seg_data, seg_state = run_segmented(df, ewma_, n_segments=6, n=10)
    assert np.array_equal(full, _collect(seg_data, "ewma"), equal_nan=True)
    # final state must still cover every key, including the sparse one
    assert seg_state.count() == df.select("key").distinct().count()


def test_segmented_resume_chains(spark, series_df):
    """Segmented head + segmented tail from the head's state == full."""
    cut = F.lit("2024-01-01 02:00:00").cast("timestamp")
    head = series_df.filter(F.col("ts") < cut)
    tail = series_df.filter(F.col("ts") >= cut)
    _, s_head = run_segmented(head, ewma_, n_segments=2, n=10)
    tail_data, _ = run_segmented(tail, ewma_, n_segments=2, n=10, state_df=s_head)
    full = ewma(series_df, 10).toPandas()
    full = full[full.ts >= tail_data.toPandas().ts.min()]
    a = _collect(tail_data, "ewma")
    b = full.sort_values(["key", "ts"])["ewma"].to_numpy(float)
    assert np.array_equal(a, b, equal_nan=True)
