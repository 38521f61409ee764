"""ewmcombine — combine RMS-1 signals with time-varying weights, rescaling
by the portfolio's model-implied vol.

Reference `_ewmcombine.py:10-213`.  Math (single-factor): with x = Σ w_i a_i,
W1 = Σw, W2 = Σw², WIJ = W1² − W2, the point estimate of the common
correlation is rho = (x² − W2)/WIJ; erho = ewma(rho, n); implied variance =
W2 + WIJ·erho, lagged one step and ffilled; output = x / vol.

Full-factor: variance = wᵀCw with C the melted EWM correlation tensor
(operators/pairwise.py), per-pair forward-filled, remaining gaps defaulting
to erho — computed as a join-aggregate over melted rows:
Σ w_i² + 2·Σ_{i<j} w_i w_j c_ij.  No matrices are ever materialized; the
whole path is joins + groupBy, so it scales with pair-rows.

Input: long frame (key=signal id, ts, a=signal, w=weight).
Output: one row per ts: (ts, x, rho, variance, vol, data, mult,
normalized_mult).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators.ewm import ewma
from pyg_timeseries_spark.operators.fill import ffill
from pyg_timeseries_spark.operators.pairwise import ewmcorrelation


def _prepared(df, key, ts, a, w):
    """ffill signals/weights per key; weight 0 before a signal's first valid
    observation (reference: fnna + zeroing, _ewmcombine.py:80-85)."""
    d = ffill(df, key=key, ts=ts, v=a, out="_a")
    d = ffill(d, key=key, ts=ts, v=w, out="_w")
    wk = Window.partitionBy(key).orderBy(ts).rowsBetween(Window.unboundedPreceding, 0)
    seen = F.count(a).over(wk)
    return (
        d.withColumn("_a", F.coalesce(F.col("_a"), F.lit(0.0)))
        .withColumn("_w", F.when(seen > 0, F.coalesce(F.col("_w"), F.lit(0.0))).otherwise(F.lit(0.0)))
    )


def ewmcombine(
    df: DataFrame,
    n: int = 128,
    key: str = "key",
    ts: str = "ts",
    a: str = "a",
    w: str = "w",
    full_corr: bool | int = False,
    portfolio: str = "_all",
) -> DataFrame:
    prep = _prepared(df, key, ts, a, w)
    xs = prep.groupBy(ts).agg(
        F.sum(F.col("_a") * F.col("_w")).alias("x"),
        F.sum("_w").alias("w1"),
        F.sum(F.col("_w") * F.col("_w")).alias("w2"),
    )
    wij = F.col("w1") * F.col("w1") - F.col("w2")
    xs = xs.withColumn("wij", F.when(wij != 0, wij))
    xs = xs.withColumn(
        "rho", (F.col("x") * F.col("x") - F.col("w2")) / F.col("wij")
    ).withColumn("pkey", F.lit(portfolio))
    xs = ewma(xs, n, key="pkey", ts=ts, v="rho", out="erho")

    if full_corr:
        corr_n = n if full_corr is True else int(full_corr)
        melted = ewmcorrelation(
            df.select(F.col(key), F.col(ts), F.col(a).alias("v")), corr_n,
            key=key, ts=ts, v="v",
        )
        # per-pair carry-forward of the last known correlation
        melted = melted.withColumn("pair", F.concat_ws("|", "key_i", "key_j"))
        melted = ffill(melted, key="pair", ts=ts, v="cor", out="cor_f")
        wts = prep.select(F.col(ts), F.col(key), F.col("_w"))
        wi = wts.select(F.col(ts), F.col(key).alias("key_i"), F.col("_w").alias("w_i"))
        wj = wts.select(F.col(ts), F.col(key).alias("key_j"), F.col("_w").alias("w_j"))
        cross = (
            melted.join(wi, on=[ts, "key_i"]).join(wj, on=[ts, "key_j"])
            .join(xs.select(ts, "erho"), on=ts, how="left")
            .withColumn("c_use", F.coalesce(F.col("cor_f"), F.col("erho")))
            .groupBy(ts)
            .agg((2.0 * F.sum(F.col("w_i") * F.col("w_j") * F.col("c_use"))).alias("offdiag"))
        )
        xs = xs.join(cross, on=ts, how="left").withColumn(
            "variance_raw",
            F.col("w2") + F.coalesce(F.col("offdiag"), F.col("wij") * F.col("erho")),
        ).drop("offdiag")
    else:
        xs = xs.withColumn(
            "variance_raw", F.col("w2") + F.col("wij") * F.col("erho")
        )

    xs = xs.withColumn(
        "variance_raw", F.when(F.col("variance_raw") > 0, F.col("variance_raw"))
    )
    wp = Window.partitionBy("pkey").orderBy(ts)
    xs = xs.withColumn("variance", F.lag("variance_raw").over(wp))
    xs = ffill(xs, key="pkey", ts=ts, v="variance", out="variance")
    xs = xs.withColumn("vol", F.sqrt("variance"))
    xs = xs.withColumn("data", F.col("x") / F.col("vol"))
    xs = xs.withColumn("mult", 1.0 / F.col("vol"))
    xs = xs.withColumn("normalized_mult", F.col("mult") * F.col("w1"))
    return xs.drop("pkey", "variance_raw")


ewmcombined = ewmcombine  # reference exports both names
