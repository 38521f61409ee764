import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyg_timeseries_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pyg_ts_tests", master="local[4]", shuffle_partitions=4)
    yield s


def make_series(n_rows=300, n_keys=3, nan_frac=0.25, seed=42):
    """Long-format fixture mirroring the reference's test data: seeded N(0,1)
    with values < quantile(nan_frac) nulled (reference pattern
    tests/test_ts_vs_pandas.py:12-24 uses a[a<0.1]=nan)."""
    rng = np.random.default_rng(seed)
    frames = []
    for k in range(n_keys):
        v = rng.normal(0, 1, n_rows)
        mask = rng.random(n_rows) < nan_frac
        v = np.where(mask, np.nan, v)
        frames.append(
            pd.DataFrame(
                {
                    "key": f"k{k}",
                    "ts": pd.date_range("2024-01-01", periods=n_rows, freq="1min"),
                    "v": v,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="session")
def series_pdf():
    return make_series()


@pytest.fixture(scope="session")
def series_df(spark, series_pdf):
    from pyspark.sql import functions as F

    # Engine convention: missing = NULL (Spark treats NaN as a value, not a
    # null — convert at the boundary).
    df = spark.createDataFrame(series_pdf)
    return df.withColumn(
        "v", F.when(F.isnan("v"), F.lit(None)).otherwise(F.col("v"))
    )
