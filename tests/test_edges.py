"""Edge cases (reference test tier #4, SURVEY.md §5): empty inputs,
all-NULL series, single rows — nothing may throw, NaN semantics hold."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F, types as T

from pyg_timeseries_spark.operators import ewm as M
from pyg_timeseries_spark.operators import expanding as E
from pyg_timeseries_spark.operators import fill as G
from pyg_timeseries_spark.operators import rolling as R
from pyg_timeseries_spark.operators import shift as S

SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("v", T.DoubleType()),
])


def _empty(spark):
    return spark.createDataFrame([], SCHEMA)


def _all_null(spark):
    pdf = pd.DataFrame({
        "key": "k0",
        "ts": pd.date_range("2024-01-01", periods=5, freq="1min"),
        "v": [None] * 5,
    })
    return spark.createDataFrame(pdf, schema=SCHEMA)


def _single(spark):
    pdf = pd.DataFrame({
        "key": ["k0"], "ts": [pd.Timestamp("2024-01-01")], "v": [2.5],
    })
    return spark.createDataFrame(pdf, schema=SCHEMA)


def test_empty_inputs(spark):
    df = _empty(spark)
    assert R.rolling_mean(df, 5).count() == 0
    assert E.cumsum(df).count() == 0
    assert S.diff(df, 1).count() == 0
    assert G.ffill(df).count() == 0
    assert M.ewma(df, 10).count() == 0


def test_all_null_series(spark):
    df = _all_null(spark)
    out = R.rolling_mean(df, 3).toPandas()
    assert len(out) == 5 and out["rolling_mean"].isna().all()
    out = M.ewma(df, 10).toPandas()
    assert len(out) == 5 and out["ewma"].isna().all()
    out = G.ffill(df, out="f").toPandas()
    assert out["f"].isna().all()
    out = E.expanding_std(df).toPandas()
    assert out["expanding_std"].isna().all()


def test_single_row(spark):
    df = _single(spark)
    assert M.ewma(df, 10).toPandas()["ewma"].iloc[0] == 2.5
    assert E.cumsum(df).toPandas()["cumsum"].iloc[0] == 2.5
    # rolling gated below n
    assert R.rolling_mean(df, 5).toPandas()["rolling_mean"].isna().all()
    assert S.diff(df, 1).toPandas()["diff"].isna().all()


def test_kernel_empty_and_single():
    from pyg_timeseries_spark.kernels import ewm_numpy as K

    res, s = K.ewma(np.array([]), 10)
    assert len(res) == 0
    res, s = K.ewma(np.array([np.nan, np.nan]), 10)
    assert np.isnan(res).all()
    res2, s2 = K.ewma(np.array([1.0]), 10, state=s)
    assert res2[0] == 1.0


def test_shift_tiebreak_deterministic(spark):
    """Duplicate (key, ts) rows: with a tiebreak column the lag order is a
    total order — stable across partitionings (ADVICE-r1 wspec note)."""
    import pandas as pd

    from pyg_timeseries_spark.operators.shift import shift

    pdf = pd.DataFrame(
        {
            "key": "k",
            "ts": pd.to_datetime(["2024-01-01"] * 4 + ["2024-01-02"] * 2),
            "v": [4.0, 1.0, 3.0, 2.0, 9.0, 5.0],
        }
    )
    outs = []
    for parts in (1, 7):
        df = spark.createDataFrame(pdf).repartition(parts)
        out = shift(df, 1, tiebreak="v").toPandas().sort_values(
            ["ts", "v"]).reset_index(drop=True)
        outs.append(out["shift"].to_numpy(float))
    import numpy as np

    assert np.array_equal(outs[0], outs[1], equal_nan=True)
    # order within the duplicate bucket follows the tiebreak column
    assert np.isnan(outs[0][0]) and outs[0][1:4].tolist() == [1.0, 2.0, 3.0]


def test_optimizers_empty_and_degenerate(spark):
    """Empty frames and single-asset inputs through the optimizer wrappers."""
    import pandas as pd

    from pyg_timeseries_spark.operators.optimizers import maxdiv, riskparity

    empty = spark.createDataFrame(
        [], schema="ts timestamp, key_i string, key_j string, cov double"
    )
    assert riskparity(empty).count() == 0
    assert maxdiv(empty.withColumnRenamed("cov", "cor")).count() == 0

    one = spark.createDataFrame(
        pd.DataFrame({"ts": [pd.Timestamp("2024-01-01")], "key_i": ["a"],
                      "key_j": ["a"], "cov": [2.0]})
    )
    o = riskparity(one).toPandas()
    assert len(o) == 1 and abs(o["weight"].iloc[0] - 1.0) < 1e-12


def test_multibuffer_empty(spark):
    import pandas as pd

    from pyg_timeseries_spark.operators.multibuffer import multibuffer

    empty = spark.createDataFrame(
        [], schema="key string, ts timestamp, asset string, target double"
    )
    assert multibuffer(empty).count() == 0
