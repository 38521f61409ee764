"""SparkSession builder tuned for this engine.

Local mode is a single JVM; on a real cluster the same configs apply per
executor.  AQE is on so skewed shuffles re-plan at runtime; Arrow is on for
the pandas-UDF kernels (the only JVM<->Python boundary in the engine).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One Arrow batch per applyInPandas group is bounded by pre-bucketing (a key's
# 1m-rollup series is <= minutes-in-retention rows, not raw rows) — see
# plans/rollup.py.  10k rows/batch keeps peak python-worker memory modest.
ARROW_BATCH_ROWS = 10_000


def get_spark(
    app_name: str = "pyg_timeseries_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — at cluster
    scale you would set this to ~2-3x total executor cores instead.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; for local[*] fall back to cpu count
        inner = master.split("[", 1)[-1].rstrip("]")
        shuffle_partitions = cpus if inner in ("*", "") else int(inner)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_BATCH_ROWS),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
