"""Full API parity surface vs gityoav/pyg-timeseries.

Every name exported by the reference's ``__init__.py`` maps here to its
Spark-native equivalent (same semantics over long-format frames), so a
reference user can locate every operator by its original name.  Stateful
``f_`` variants return (data, state) pairs per the reference convention
(_decorators.py:21-31).

Status legend (also the coverage table in README.md):
  native   — Catalyst window/agg expression
  kernel   — Arrow-batched applyInPandas sequential kernel (resumable)
  deferred — documented below, not yet implemented
"""

from __future__ import annotations

from pyg_timeseries_spark.operators.fill import (  # native
    ffill, bfill, ewfill, fnna, fnnz, na2v, v2na, init2v, fnna_like,
)
from pyg_timeseries_spark.operators.shift import shift, diff, ratio  # native
from pyg_timeseries_spark.operators.rolling import (  # native
    rolling_sum, rolling_mean, rolling_rms, rolling_std, rolling_skew,
    rolling_min, rolling_max, rolling_mad, rolling_median, rolling_quantile,
    rolling_rank, rolling_theilsen, rolling_trimmed_mean,
)
from pyg_timeseries_spark.operators.expanding import (  # native
    cumsum, cumprod, expanding_mean, expanding_rms, expanding_std,
    expanding_skew, expanding_min, expanding_max, expanding_median,
    expanding_rank,
)
from pyg_timeseries_spark.operators.ts import (  # native (partial+final agg)
    ts_count, ts_sum, ts_mean, ts_rms, ts_std, ts_skew, ts_min, ts_max,
    ts_median, ts_cor, ts_interval, ts_argmax, ts_argmin, ts_quantile,
    ts_acf, ts_ar2, ts_variance_ratio,
)
from pyg_timeseries_spark.operators.ewm import (  # kernel
    ewma, ewmrms, ewmstd, ewmvar, ewmskew,
    ewma_, ewmrms_, ewmstd_, ewmvar_, ewmskew_,
)
from pyg_timeseries_spark.operators.pairwise import (  # kernel
    ewmxcor, ewmxcor_, ewmxcovar, ewmxcovar_, ewmxLR, ewmxLR_,
    ewmcorrelation, ewmcorrelation_, ewmcovariance, ewmcovariance_,
)
from pyg_timeseries_spark.operators.composite import (  # DAG + nested state
    ou_factor, ewmacd, ewmacd_, ewmvol, ewmvol_,
)
from pyg_timeseries_spark.operators.recurrence import (  # kernel
    zmooth, zmooth_, buffer, buffer_, rolling_tover, rolling_tover_,
)
from pyg_timeseries_spark.operators.multibuffer import (  # kernel (bisection)
    multibuffer, multibuffer_,
)
from pyg_timeseries_spark.operators.optimizers import (  # per-date QPs
    least_squares, maxdiv, minimize_tracking_error, minimize_tracking_error_,
    riskparity,
)
from pyg_timeseries_spark.operators.reindex import (  # as-of tensor realign
    reindex_3d, reindex_melted,
)
from pyg_timeseries_spark.operators.align import (  # pyg_base df_concat's
    align_series,  # join='outer'/'inner' × method='ffill' alignment
)
# engine extensions beyond the reference surface (training-data pipeline)
from pyg_timeseries_spark.textops.packing import (
    pack_concat, pack_greedy, pack_stats,
)
from pyg_timeseries_spark.textops.corpus import (
    contaminated_docs, decontaminate, quality_gate, sample_corpus,
)
from pyg_timeseries_spark.textops.analysis import (
    repetition_stats,  # Gopher repetition filters, expression-only
)
from pyg_timeseries_spark.operators.sessions import (
    sessionize, session_stats, session_window_counts, stream_session_counts,
    gap_stats,
)
from pyg_timeseries_spark.operators.resample import (
    time_bucket_col, resample, ohlc_resample, twap_resample,
)
from pyg_timeseries_spark.operators.rolling_pair import (
    rolling_cor, rolling_beta, rolling_zscore,
)
from pyg_timeseries_spark.operators.clean import despike, hampel, winsorize
from pyg_timeseries_spark.operators.align import asof_join
from pyg_timeseries_spark.textops.vocab import token_entropy
from pyg_timeseries_spark.textops.corpus import split_corpus
from pyg_timeseries_spark.functions.drift import psi_drift, ks_drift
from pyg_timeseries_spark.operators.rolling_pair import (
    expanding_cor, expanding_beta, rolling_cov, expanding_cov,
)
from pyg_timeseries_spark.functions.sketches import (  # mergeable summaries
    kmv_sketch, kmv_merge, kmv_estimate,
    cms_sketch, cms_merge, cms_query,
    bottomk_sample, bottomk_merge, bottomk_quantile,
)
from pyg_timeseries_spark.dedup.incremental import IncrementalDeduper
from pyg_timeseries_spark.dedup.components import connected_components  # r4
from pyg_timeseries_spark.operators.interval_join import interval_join  # r4
from pyg_timeseries_spark.operators.rolling_pair import rolling_acf  # r4
from pyg_timeseries_spark.plans.rollup import rollup_grouping_sets  # r4
from pyg_timeseries_spark.streaming.stream_rollup import stream_dedup  # r4
from pyg_timeseries_spark.textops.corpus import (  # r4
    boilerplate_coverage, mixture_sample,
)
from pyg_timeseries_spark.dedup.substr import chunk_dedup, doc_chunks  # r5
from pyg_timeseries_spark.dedup.components import cluster_canonical  # r5
from pyg_timeseries_spark.dedup.components_store import ComponentStore  # r5
from pyg_timeseries_spark.operators.holt import (  # r5
    holt, holt_, holt_winters, holt_winters_,
)
from pyg_timeseries_spark.operators.kalman import kalman, kalman_  # r5
from pyg_timeseries_spark.operators.regime import (  # r5
    cusum, drawdown, max_drawdown,
)
from pyg_timeseries_spark.operators.seasonal import (  # r5
    deseasonalize, seasonal_profile,
)
from pyg_timeseries_spark.operators.ts import (  # r5
    ts_trimmed_mean, ts_winsorized_mean,
)
from pyg_timeseries_spark.operators.ts import (  # r5 batch 2
    ts_halflife, ts_ljungbox,
)
from pyg_timeseries_spark.operators.ts import ts_hurst  # r5 batch 3
from pyg_timeseries_spark.operators.ts import ts_entropy  # r5 batch 4
from pyg_timeseries_spark.operators.ts import (  # r5 batch 5
    ts_jarque_bera, ts_kurtosis,
)
from pyg_timeseries_spark.operators.fill import to_grid  # r5 batch 5
from pyg_timeseries_spark.operators.rolling import rolling_rsi  # r5 batch 3
from pyg_timeseries_spark.operators.rolling import rolling_time_agg  # r5 b4
from pyg_timeseries_spark.operators.shift import make_lags  # r5 batch 4
from pyg_timeseries_spark.operators.regime import ts_peaks  # r5 batch 3
from pyg_timeseries_spark.textops.vocab import (  # r5 batch 3
    build_vocab, encode_tokens,
)
from pyg_timeseries_spark.operators.shift import (  # r5 batch 2
    fracdiff, fracdiff_weights,
)
from pyg_timeseries_spark.operators.fill import interp  # r5 batch 2
from pyg_timeseries_spark.operators.resample import realized_vol  # r5 batch 2
from pyg_timeseries_spark.textops.analysis import (  # r5 batch 2
    pii_redact, pii_scan,
)
from pyg_timeseries_spark.textops.packing import shard_by_budget  # r5 batch 2
from pyg_timeseries_spark.textops.lm import (  # r4
    char_bigram_counts, perplexity_score,
)
from pyg_timeseries_spark.kernels.multibuffer_numpy import (
    beta_correlation_matrix, near_correlation_matrix,
)
from pyg_timeseries_spark.operators.xrank import (
    xrank, xrank_simple, xsec_zscore, xsec_winsorize,
)
from pyg_timeseries_spark.operators.matrix import (  # kernel (np.linalg)
    ewmAAi, ewmAAi_, ewmGLM, ewmGLM_, ewmcorr_psd, ewmcorr_psd_,
)
from pyg_timeseries_spark.kernels.matrix_numpy import (
    ewmcorr_psd_ov, overlapping_rows,
)
from pyg_timeseries_spark.operators.combine import (  # composition
    ewmcombine, ewmcombined,
)
from pyg_timeseries_spark.operators.bars import (  # native
    bar_r2, ohlc_r2, bar_daily_to_eod, overlapping_returns,
)
from pyg_timeseries_spark.operators.window_state import (
    make_stateful, tail_state, expanding_state, resume_cumsum,
)
from pyg_timeseries_spark.compress.cor_codec import (
    CODEC as CORRELATION_CODEC,
    encode_correlations, decode_correlations, correlation_resolution,
    encode_cor_col, decode_cor_col,
)
from pyg_timeseries_spark.functions.psd import (
    psd_correlation, clip_eigenvalues, min_eigenvalue, normalise_diagonal,
    shrink_to_identity, matmul,
)

# ---- reference aliases ------------------------------------------------------

# the reference exports expanding_sum as an alias of cumsum
expanding_sum = cumsum


def correlation_codec(dtype=None):
    """(scale, sentinel) pair for a packing dtype (reference _cor.py:10-23)."""
    import numpy as np

    if dtype is None:
        return (1.0, np.nan)
    key = str(np.dtype(dtype))
    return CORRELATION_CODEC.get(key, (1.0, np.nan))


min_eigenvalues = min_eigenvalue  # reference name (plural)

# ewmcorr/ewmcovar are the reference's "single shared clock" variants of
# ewmcorrelation/ewmcovariance (_ewm.py:688-921); in long format both reduce
# to the melted pairwise tensor.
ewmcorr = ewmcorrelation
ewmcovar = ewmcovariance

# stateful (data, state) variants of the Catalyst-native window operators —
# state is the key's trailing valid rows (operators/window_state.py), resume
# is bit-identical to a full run.
ffill_ = make_stateful(ffill, state_n=1)
shift_ = make_stateful(shift, state_n=1)
diff_ = make_stateful(diff, state_n=1)
ratio_ = make_stateful(ratio, state_n=1)


def rolling_mean_(df, n, **kw):
    return make_stateful(rolling_mean, state_n=n - 1)(df, n, **kw)


def rolling_sum_(df, n, **kw):
    return make_stateful(rolling_sum, state_n=n - 1)(df, n, **kw)


def rolling_rms_(df, n, **kw):
    return make_stateful(rolling_rms, state_n=n - 1)(df, n, **kw)


def rolling_std_(df, n, **kw):
    return make_stateful(rolling_std, state_n=n - 1)(df, n, **kw)


def rolling_skew_(df, n, **kw):
    return make_stateful(rolling_skew, state_n=n - 1)(df, n, **kw)


def rolling_min_(df, n, **kw):
    return make_stateful(rolling_min, state_n=n - 1)(df, n, **kw)


def rolling_max_(df, n, **kw):
    return make_stateful(rolling_max, state_n=n - 1)(df, n, **kw)


def rolling_median_(df, n, **kw):
    return make_stateful(rolling_median, state_n=n - 1)(df, n, **kw)


def rolling_quantile_(df, n, q, **kw):
    return make_stateful(rolling_quantile, state_n=n - 1)(df, n, q, **kw)


def rolling_rank_(df, n, **kw):
    return make_stateful(rolling_rank, state_n=n - 1)(df, n, **kw)


# expanding/ts state = per-key moment sums (exact integer-domain resume);
# the *_ variants return (data, moment-state) pairs.
def _expanding_pair(op):
    def op_(df, *args, **kw):
        from pyspark.sql import functions as F

        data = op(df, *args, **kw)
        v = kw.get("v", "v")
        key = kw.get("key", "key")
        state = expanding_state(df.filter(F.col(v).isNotNull()), key=key, v=v)
        return data, state
    op_.__name__ = op.__name__ + "_"
    return op_


cumsum_ = _expanding_pair(cumsum)
cumprod_ = _expanding_pair(cumprod)
expanding_mean_ = _expanding_pair(expanding_mean)
expanding_sum_ = cumsum_
expanding_rms_ = _expanding_pair(expanding_rms)
expanding_std_ = _expanding_pair(expanding_std)
expanding_skew_ = _expanding_pair(expanding_skew)
expanding_min_ = _expanding_pair(expanding_min)
expanding_max_ = _expanding_pair(expanding_max)

ts_count_ = _expanding_pair(ts_count)
ts_sum_ = _expanding_pair(ts_sum)
ts_mean_ = _expanding_pair(ts_mean)
ts_rms_ = _expanding_pair(ts_rms)
ts_std_ = _expanding_pair(ts_std)
ts_skew_ = _expanding_pair(ts_skew)
ts_min_ = _expanding_pair(ts_min)
ts_max_ = _expanding_pair(ts_max)
ts_cor_ = _expanding_pair(ts_cor)

# real (data, state) stateful forms — state keyed per pair (key_i, key_j)
# for the melted tensors; reference f_ contract _decorators.py:21-31
ewmcorr_ = ewmcorrelation_
ewmcovar_ = ewmcovariance_

# ---- formerly deferred, now implemented -------------------------------------
# multibuffer (bisection recurrence, operators/multibuffer.py) and the
# portfolio optimizers (operators/optimizers.py — plain-NumPy solvers:
# least_squares == lstsq; riskparity via cyclical coordinate descent, which
# zeroes the reference's scipy objective exactly; maxdiv via an exact
# active-set QP; minimize_tracking_error's greedy integer descent was
# already scipy-free).  Custom least_squares cost functions (cvxpy) remain
# out of scope — only the default sum_squares cost is supported.
# rms_combine           dead in the reference as shipped (_rms_join.py:4
#   imports a module that does not exist) — not reproduced.
# ts_iterate            superseded by the incremental RollupStore driver.
# reindex_3d            implemented as the as-of tensor realign
#                        (operators/reindex.py — union + last_value window).
# compiled / mask_nans / apply_along_first_axis — reference-internal numba
#   decorators with no Spark meaning.
