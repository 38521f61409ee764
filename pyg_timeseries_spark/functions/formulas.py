"""Exact-parity moment formulas as Spark Column expressions.

These re-express the reference's moment calculations (/root/reference/src/
pyg_timeseries/_math.py — stdev_calculation :16-21, std_calculation :23-28,
skew_calculation :122-135, cor_calculation :69-82) as column arithmetic over
window/group sums Σ1, Σx, Σx², Σx³, so that every rolling/expanding/whole-
series moment in this engine uses the same algebra the reference uses,
not merely a same-named builtin.

All functions take Columns (the moment sums) and return a Column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stdev_calc(t0: Column, t1: Column, t2: Column) -> Column:
    """Unbiased sample std from sums: sqrt(t2/(t0-1) - t1²/((t0-1)·t0)).
    NULL when t0 <= 1 or negative variance (float guard)."""
    p = t0 - F.lit(1.0)
    var = t2 / p - (t1 * t1) / (p * t0)
    return F.when((t0 > 1) & (var >= 0), F.sqrt(var))


def std_biased_calc(t0: Column, t1: Column, t2: Column) -> Column:
    """Biased (population) std — used inside correlation for pandas parity."""
    var = t2 / t0 - (t1 * t1) / (t0 * t0)
    return F.when((t0 > 1) & (var >= 0), F.sqrt(var))


def skew_calc(t0: Column, t1: Column, t2: Column, t3: Column, bias: bool = False) -> Column:
    """Rolling/expanding skew from Σ1..Σx³; unbiased correction
    sqrt(t0(t0-1))/(t0-2) unless ``bias`` (matches pandas .skew())."""
    m1 = t1 / t0
    m2 = t2 / t0 - m1 * m1
    m3 = t3 / t0 - F.lit(3.0) * m1 * (t2 / t0) + F.lit(2.0) * m1 * m1 * m1
    biased = m3 / F.pow(m2, 1.5)
    if bias:
        res = biased
    else:
        # unbiased correction undefined for t0 <= 2 → NULL (pandas emits NaN
        # there too; the reference falls back to the biased value,
        # _math.py:129-130 — we pick the pandas/standard gate).
        res = F.when(t0 > 2, biased * F.sqrt(t0 * (t0 - 1)) / (t0 - 2))
    return F.when(m2 > 0, res)


def cor_calc(t0: Column, a1: Column, a2: Column, b1: Column, b2: Column, ab: Column) -> Column:
    """Full-sample correlation from sums (biased stds, pandas-parity)."""
    num = ab / t0 - (a1 / t0) * (b1 / t0)
    denom = std_biased_calc(t0, a1, a2) * std_biased_calc(t0, b1, b2)
    return F.when(denom > 0, num / denom)
