"""The api module exposes every reference export (or a documented deferral),
and the stateful aliases actually run."""

import numpy as np
from pyspark.sql import functions as F

import pyg_timeseries_spark.api as api

REFERENCE_EXPORTS = """
ewma ewma_ ewmstd ewmvar ewmstd_ ewmrms ewmrms_ ewmskew ewmskew_ ewmvar_
ewmxcor ewmxcor_ ewmxLR ewmxLR_ ewmcorr ewmcorr_ ewmcorrelation
ewmcorrelation_ ewmcovar ewmcovar_ ewmcovariance ewmcovariance_
overlapping_returns rolling_min rolling_min_ expanding_min expanding_min_
rolling_max rolling_max_ expanding_max expanding_max_ rolling_median
rolling_median_ expanding_median rolling_rank rolling_rank_ expanding_rank
ffill ffill_ ewfill bfill fnna fnnz diff shift ratio rolling_mean rolling_sum
rolling_rms rolling_std rolling_skew diff_ shift_ ratio_ rolling_mean_
rolling_sum_ rolling_rms_ rolling_std_ rolling_skew_ v2na na2v buffer_ buffer
rolling_tover rolling_quantile rolling_quantile_ cumsum cumprod cumsum_
cumprod_ expanding_mean expanding_sum expanding_rms expanding_std
expanding_skew expanding_mean_ expanding_sum_ expanding_rms_ expanding_std_
expanding_skew_ ts_std ts_sum ts_mean ts_skew ts_count ts_min ts_max ts_rms
ts_median ts_cor ts_interval ts_std_ ts_sum_ ts_mean_ ts_skew_ ts_count_
ts_min_ ts_max_ ts_rms_ ts_cor_ ou_factor ewmacd ewmacd_ ewmvol_ ewmvol
xrank fnna_like matmul bar_r2 bar_daily_to_eod ohlc_r2 zmooth zmooth_
correlation_codec decode_correlations encode_correlations CORRELATION_CODEC
psd_correlation min_eigenvalues clip_eigenvalues normalise_diagonal
""".split()


def test_every_reference_export_is_mapped():
    missing = [n for n in REFERENCE_EXPORTS if not hasattr(api, n)]
    assert not missing, f"unmapped reference exports: {missing}"


def test_correlation_codec_constants():
    assert api.correlation_codec("int8") == (100.0, 127)
    assert api.correlation_codec("int16") == (10000.0, 32767)
    scale, nan = api.correlation_codec(None)
    assert scale == 1.0 and np.isnan(nan)


def test_stateful_rolling_alias_runs(spark, series_df):
    data, state = api.rolling_sum_(series_df, 5)
    assert "rolling_sum" in data.columns
    # tail-row state: up to n-1 valid rows per key
    per_key = state.groupBy("key").count().toPandas()
    assert len(per_key) == 3 and (per_key["count"] <= 4).all()


def test_expanding_pair_alias_runs(spark, series_df):
    data, state = api.ts_mean_(series_df)
    assert state.columns == ["key", "t0", "t1", "t2", "t3", "m_min", "m_max"]
    assert state.count() == 3


def test_rolling_tover_runs(spark, series_df):
    out = api.rolling_tover(series_df, n=16).toPandas()
    assert out["rolling_tover"].notna().sum() > 0
