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
