"""State-split invariant (reference test strategy #3, SURVEY.md §5; reference
tests/test_ts_states.py:39-153): f_(head).data ++ f(tail, state=f_(head).state)
== f(full), bit-for-bit — for EWM kernels, the rollup cascade, and the
incremental checkpoint store.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.kernels import ewm_numpy
from pyg_timeseries_spark.operators import ewm as M


SPLITS = [1, 7, 100, 250]


@pytest.mark.parametrize("kernel_name", list(ewm_numpy.KERNELS))
def test_kernel_state_split_bitexact(kernel_name, series_pdf):
    """NumPy-kernel level: exact float equality across arbitrary splits."""
    kernel = ewm_numpy.KERNELS[kernel_name]
    a = (
        series_pdf[series_pdf.key == "k0"]
        .sort_values("ts")["v"]
        .to_numpy(float)
    )
    full, _ = kernel(a, 10)
    for k in SPLITS:
        head, s = kernel(a[:k], 10)
        tail, _ = kernel(a[k:], 10, state=s)
        glued = np.concatenate([head, tail])
        assert np.array_equal(glued, full, equal_nan=True), (kernel_name, k)


def test_ewma_spark_state_split(spark, series_df):
    """Spark level: resume from the persisted state table."""
    cut = F.lit("2024-01-01 02:00:00").cast("timestamp")
    head = series_df.filter(F.col("ts") < cut)
    tail = series_df.filter(F.col("ts") >= cut)

    full = M.ewma(series_df, 10).toPandas().sort_values(["key", "ts"])
    _, state = M.ewma_(head, 10)
    resumed = M.ewma(tail, 10, state_df=state).toPandas().sort_values(["key", "ts"])

    full_tail = full[full.ts >= resumed.ts.min()].reset_index(drop=True)
    resumed = resumed.reset_index(drop=True)
    assert len(full_tail) == len(resumed)
    g = resumed["ewma"].to_numpy(float)
    e = full_tail["ewma"].to_numpy(float)
    assert np.array_equal(g, e, equal_nan=True), "resume is not bit-identical"


def test_ewmstd_spark_state_split(spark, series_df):
    cut = F.lit("2024-01-01 01:30:00").cast("timestamp")
    head = series_df.filter(F.col("ts") < cut)
    tail = series_df.filter(F.col("ts") >= cut)
    full = M.ewmstd(series_df, 10).toPandas().sort_values(["key", "ts"])
    _, state = M.ewmstd_(head, 10)
    resumed = M.ewmstd(tail, 10, state_df=state).toPandas().sort_values(["key", "ts"])
    full_tail = full[full.ts >= resumed.ts.min()].reset_index(drop=True)
    g = resumed.reset_index(drop=True)["ewmstd"].to_numpy(float)
    e = full_tail["ewmstd"].to_numpy(float)
    assert np.array_equal(g, e, equal_nan=True)
