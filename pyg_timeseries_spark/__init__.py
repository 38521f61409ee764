"""pyg_timeseries_spark — a PySpark-native timeseries rollup / downsample /
retention engine with the query semantics of gityoav/pyg-timeseries.

Built from scratch on the Spark DataFrame API (Catalyst-optimized window
functions for everything SQL-expressible; Arrow-vectorized ``applyInPandas``
kernels only for the sequential recurrences such as the EWM family).

Data model: long-format frames ``(key, ts, v)`` — one row per observation per
series — instead of the reference's in-memory pandas Series/ndarray.  NaN is
"data missing" and is skipped, never propagated (reference semantics:
/root/reference/src/pyg_timeseries/_rolling.py:454-463).

Semantic blueprint: SURVEY.md in the repo root.  The reference is cited by
file:line in operator docstrings for parity checking; no reference code is
copied.
"""

from pyg_timeseries_spark.session import get_spark
from pyg_timeseries_spark.operators.fill import (
    ffill, bfill, na2v, v2na, init2v, fnna,
)
from pyg_timeseries_spark.operators.shift import shift, diff, ratio
from pyg_timeseries_spark.operators.rolling import (
    rolling_sum, rolling_mean, rolling_rms, rolling_std, rolling_skew,
    rolling_min, rolling_max, rolling_median, rolling_quantile, rolling_rank,
)
from pyg_timeseries_spark.operators.expanding import (
    cumsum, cumprod, expanding_mean, expanding_rms, expanding_std,
    expanding_skew, expanding_min, expanding_max, expanding_median,
    expanding_rank,
)
from pyg_timeseries_spark.operators.ewm import (
    ewma, ewmrms, ewmstd, ewmvar, ewmskew, ewma_, ewmrms_, ewmstd_, ewmvar_,
    ewmskew_,
)
from pyg_timeseries_spark.operators.ts import (
    ts_count, ts_sum, ts_mean, ts_rms, ts_std, ts_skew, ts_min, ts_max,
    ts_median, ts_cor, ts_interval,
)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    # gap-fill
    "ffill", "bfill", "na2v", "v2na", "init2v", "fnna",
    # shift family
    "shift", "diff", "ratio",
    # rolling
    "rolling_sum", "rolling_mean", "rolling_rms", "rolling_std",
    "rolling_skew", "rolling_min", "rolling_max", "rolling_median",
    "rolling_quantile", "rolling_rank",
    # expanding
    "cumsum", "cumprod", "expanding_mean", "expanding_rms", "expanding_std",
    "expanding_skew", "expanding_min", "expanding_max", "expanding_median",
    "expanding_rank",
    # ewm
    "ewma", "ewmrms", "ewmstd", "ewmvar", "ewmskew",
    "ewma_", "ewmrms_", "ewmstd_", "ewmvar_", "ewmskew_",
    # whole-series reductions
    "ts_count", "ts_sum", "ts_mean", "ts_rms", "ts_std", "ts_skew",
    "ts_min", "ts_max", "ts_median", "ts_cor", "ts_interval",
]
