"""Structured Streaming front-end for the rollup engine.

Batch and streaming share one aggregation definition: `stream_rollup_1m`
applies the same (source, 1-minute window) aggregate as plans/rollup.py but
over a streaming DataFrame with a watermark — late rows inside the watermark
re-aggregate their open bucket (the reference's same-time-unit replace,
`_ewm.py:41-44`, at bucket granularity); rows later than the watermark are
dropped deterministically.

`foreach_batch_ingest` is the exactly-once sink: each micro-batch flows
through RollupStore.ingest, which is associative-merge idempotent by bucket,
so replayed batches converge to the same rollup rows.

(The sandbox driver contract is batch; this module is exercised by
tests/test_streaming.py with a file source + memory/foreachBatch sinks.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyg_timeseries_spark.plans.checkpoint import RollupStore


def stream_rollup_1m(
    stream_df: DataFrame,
    ts: str = "ts",
    v: str = "n_tok",
    key: str = "source",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Continuous 1m aggregate with late-data tolerance of ``watermark``."""
    c = F.col(v).cast("long")
    return (
        stream_df.withWatermark(ts, watermark)
        .groupBy(F.col(key).alias("source"), F.window(ts, "1 minute").alias("w"))
        .agg(
            F.count(c).alias("cnt"),
            F.sum(c).alias("sum_n_tok"),
            F.sum(c * c).alias("sum2_n_tok"),
            F.sum(c * c * c).alias("sum3_n_tok"),
            F.min(c).alias("min_n_tok"),
            F.max(c).alias("max_n_tok"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
        )
        .select(
            "source", F.col("w.start").alias("bucket"), "cnt", "sum_n_tok",
            "sum2_n_tok", "sum3_n_tok", "min_n_tok", "max_n_tok",
            "first_ts", "last_ts",
        )
    )


def foreach_batch_ingest(store: RollupStore, ts: str = "ts", v: str = "n_tok",
                         tokens: str | None = None, key: str = "source"):
    """foreachBatch callback: route each raw micro-batch through the
    incremental store (idempotent associative merge per bucket)."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.ingest(batch_df, ts=ts, v=v, tokens=tokens, key=key)

    return fn


def start_file_stream_ingest(
    spark,
    input_dir: str,
    store: RollupStore,
    schema,
    ts: str = "ts",
    v: str = "n_tok",
    key: str = "source",
    checkpoint_dir: str | None = None,
):
    """File-source streaming ingestion into the rollup store (the local
    stand-in for a Kafka source; same code path from the watermark down)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(foreach_batch_ingest(store, ts=ts, v=v, key=key))
        .option("checkpointLocation", checkpoint_dir or (store.path + "/_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    return q


def stream_ewma(
    stream_df,
    n: float,
    key: str = "source",
    ts: str = "bucket",
    v: str = "sum_n_tok",
    out: str = "ewma",
):
    """Stateful streaming EWM mean via ``applyInPandasWithState``: per key the
    GroupState holds exactly the engine's packed kernel state
    (kernels/ewm_numpy.py), so a restarted / resumed stream continues
    bit-identically — the reference's (data, state) invariant lifted onto
    Structured Streaming.

    Contract: rows must arrive time-ordered per key across micro-batches
    (use a watermark + sorted sources upstream); within a batch any order is
    fine (sorted here).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from pyg_timeseries_spark.kernels import ewm_numpy

    out_schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField(ts, T.TimestampType()),
            T.StructField(v, T.DoubleType()),
            T.StructField(out, T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("packed", T.ArrayType(T.DoubleType()))]
    )

    def fn(group_key, pdf_iter, state: GroupState):
        prior = None
        if state.exists:
            (packed,) = state.get
            if packed is not None and len(packed) == ewm_numpy.STATE_LEN:
                prior = np.asarray(packed, dtype=np.float64)
        frames = [p for p in pdf_iter]
        pdf = pd.concat(frames, ignore_index=True).sort_values(ts)
        a = pdf[v].to_numpy(dtype=np.float64, na_value=np.nan)
        res, s = ewm_numpy.ewma(a, n, state=prior)
        state.update(([float(x) for x in s],))
        yield pd.DataFrame(
            {
                key: group_key[0],
                ts: pdf[ts].values,
                v: pdf[v].values,
                out: res,
            }
        )

    return (
        stream_df.select(key, ts, v)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
