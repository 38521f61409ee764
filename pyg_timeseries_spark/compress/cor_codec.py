"""Packed correlation codec — int8 / int16 storage of correlations with an
integer NaN sentinel.

Same codec constants as the reference (`_cor.py:3-22`: int8 → scale 100,
sentinel 127; int16 → scale 10000, sentinel 32767); the memory motivation is
the reference's own tensor math (`_ewm_psd.py:244-245`: a (7000, 200, 200)
tensor is 1.1 GB float32 vs 280 MB int8).  In the melted long-format tensor
(operators/pairwise.py) the packed value is just a TINYINT/SMALLINT column —
Parquet dictionary/RLE encoding then compresses it further.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CODEC = {
    "int8": (100.0, 127),
    "int16": (10000.0, 32767),
}
_SPARK_TYPE = {"int8": "tinyint", "int16": "smallint"}


# ---- numpy ------------------------------------------------------------------

def encode_correlations(cor: np.ndarray, dtype: str = "int8") -> np.ndarray:
    """round(clip(c)·scale), NaN → sentinel.  Rounding (not truncation) keeps
    the packing unbiased."""
    scale, nan = CODEC[dtype]
    res = np.round(np.clip(cor, -1.0, 1.0) * scale)
    return np.where(np.isnan(res), nan, res).astype(dtype)


def decode_correlations(packed: np.ndarray, dtype: str | None = None) -> np.ndarray:
    scale, nan = CODEC[dtype or str(packed.dtype)]
    res = packed.astype(float)
    return np.where(res == nan, np.nan, res) / scale


def correlation_resolution(dtype: str) -> float:
    return 1.0 / CODEC[dtype][0]


# ---- Spark columns ----------------------------------------------------------

def encode_cor_col(c: Column, dtype: str = "int8") -> Column:
    scale, nan = CODEC[dtype]
    # Missing must branch explicitly: Spark orders NaN as the LARGEST double
    # (least(NaN, 1.0) → 1.0) and least/greatest SKIP nulls — either way a
    # missing correlation would silently pack as +1.0
    missing = c.isNull() | F.isnan(c)
    packed = F.round(
        F.greatest(F.least(c, F.lit(1.0)), F.lit(-1.0)) * scale
    )
    return F.when(missing, F.lit(nan)).otherwise(packed).cast(_SPARK_TYPE[dtype])


def decode_cor_col(c: Column, dtype: str = "int8") -> Column:
    scale, nan = CODEC[dtype]
    return F.when(c != nan, c.cast("double") / scale)


def pack_correlation_table(df: DataFrame, cor_col: str = "cor",
                           dtype: str = "int8") -> DataFrame:
    return df.withColumn(cor_col, encode_cor_col(F.col(cor_col), dtype))


def unpack_correlation_table(df: DataFrame, cor_col: str = "cor",
                             dtype: str = "int8") -> DataFrame:
    return df.withColumn(cor_col, decode_cor_col(F.col(cor_col), dtype))
