"""PSD repair of correlation matrices + NaN-aware matmul.

Reference: /root/reference/src/pyg_timeseries/_psd.py:24-238
(psd_correlation, clip_eigenvalues, min_eigenvalues, normalise_diagonal,
shrink_to_identity) and _matmul.py:8-128.

NumPy implementations operate on one (m, m) matrix; `repair_melted` lifts
them over the melted long-format correlation tensor (ts, key_i, key_j, cor)
via groupBy(ts).applyInPandas — each timestamp's matrix is rebuilt, repaired
with np.linalg, and re-melted.  Matrix sizes are the cross-section (m ≤ a
few hundred), so per-group work is trivial and timestamps parallelize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


# ---- single-matrix numpy ----------------------------------------------------

def normalise_diagonal(m: np.ndarray) -> np.ndarray:
    """Rescale to unit diagonal: C'ij = Cij / sqrt(Cii·Cjj)."""
    d = np.sqrt(np.clip(np.diag(m), 1e-300, None))
    return m / np.outer(d, d)


def min_eigenvalue(m: np.ndarray) -> float:
    return float(np.linalg.eigvalsh(m)[0])


def clip_eigenvalues(m: np.ndarray, floor: float = 0.0) -> np.ndarray:
    """Eigenvalue clip + diagonal renormalization — the standard PSD repair."""
    vals, vecs = np.linalg.eigh(m)
    vals = np.clip(vals, floor, None)
    repaired = (vecs * vals) @ vecs.T
    return normalise_diagonal(repaired)


def shrink_to_identity(m: np.ndarray, shrinkage: float) -> np.ndarray:
    return (1 - shrinkage) * m + shrinkage * np.eye(m.shape[0])


def psd_correlation(m: np.ndarray, floor: float = 0.0) -> np.ndarray:
    """Make a correlation matrix PSD: NaNs off-diagonal → 0 (uninformative),
    diagonal → 1, then eigenvalue clip (reference _psd.py:96-155)."""
    c = np.array(m, dtype=float)
    n = c.shape[0]
    nanmask = np.isnan(c)
    c[nanmask] = 0.0
    np.fill_diagonal(c, 1.0)
    c = 0.5 * (c + c.T)
    if min_eigenvalue(c) < floor:
        c = clip_eigenvalues(c, floor)
    return c


def matmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """NaN-masked matrix multiply: NaN entries contribute 0, a fully-NaN
    row/col pairing yields NaN (reference _matmul.py:8-128, mask_nans
    _decorators.py:131-158)."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    a0 = np.where(np.isnan(a), 0.0, a)
    b0 = np.where(np.isnan(b), 0.0, b)
    res = a0 @ b0
    counts = (~np.isnan(a)).astype(float) @ (~np.isnan(b)).astype(float)
    return np.where(counts > 0, res, np.nan)


# ---- melted-tensor lift -----------------------------------------------------

def repair_melted(
    cor_df: DataFrame,
    ts: str = "ts",
    ki: str = "key_i",
    kj: str = "key_j",
    cor: str = "cor",
    floor: float = 0.0,
) -> DataFrame:
    """PSD-repair every timestamp's correlation matrix in a melted tensor
    (upper-triangle rows; diagonal implied 1).  Returns the same melted
    shape with repaired values."""
    out_schema = T.StructType(
        [
            T.StructField(ts, cor_df.schema[ts].dataType),
            T.StructField(ki, cor_df.schema[ki].dataType),
            T.StructField(kj, cor_df.schema[kj].dataType),
            T.StructField(cor, T.DoubleType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = sorted(set(pdf[ki]) | set(pdf[kj]))
        idx = {k: i for i, k in enumerate(keys)}
        m = len(keys)
        c = np.full((m, m), np.nan)
        np.fill_diagonal(c, 1.0)
        for r in pdf.itertuples(index=False):
            i, j = idx[getattr(r, ki)], idx[getattr(r, kj)]
            val = getattr(r, cor)
            c[i, j] = c[j, i] = val if val is not None else np.nan
        repaired = psd_correlation(c, floor)
        rows = [
            (pdf[ts].iloc[0], keys[i], keys[j], float(repaired[i, j]))
            for i in range(m)
            for j in range(i + 1, m)
        ]
        return pd.DataFrame(rows, columns=[ts, ki, kj, cor])

    return cor_df.groupBy(ts).applyInPandas(fn, schema=out_schema)


def eigenvalues(m: np.ndarray) -> np.ndarray:
    """Eigenvalues of a symmetric matrix, ascending (reference _linalg.py:14-40,
    commented out of the reference's exports but part of its surface)."""
    return np.linalg.eigvalsh(m)


def eigenvectors(m: np.ndarray) -> np.ndarray:
    return np.linalg.eigh(m)[1]


def det(m: np.ndarray) -> float:
    return float(np.linalg.det(m))


def quantisation_noise(dtype: str, m: int) -> float:
    """PSD-safety bound for packing a correlation matrix of size m into an
    integer dtype: rounding perturbs each entry by up to 1/(2·scale), which
    can push the smallest eigenvalue down by up to m·(resolution/2)
    (Gershgorin) — shrinkage must exceed this (reference guard,
    _ewm_psd.py:123-129)."""
    from pyg_timeseries_spark.compress.cor_codec import CODEC

    scale, _ = CODEC[dtype]
    return m * (1.0 / scale) / 2.0
