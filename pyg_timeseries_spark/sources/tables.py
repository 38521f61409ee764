"""Table loading for driver testdata + the (stubbed) Iceberg catalog path.

The production design targets Iceberg catalog tables (`spark.read.table`,
`MERGE INTO`, snapshot expiry); the sandbox image has no Iceberg jars, so
`iceberg_available()` gates that path and everything falls back to parquet
(the snapshot-versioned store in plans/checkpoint.py keeps the same
contract: immutable snapshots + atomic pointer swap).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is actually loadable.  NB: plain
    attribute access (spark._jvm.org.apache.iceberg.Table) is NOT a check —
    py4j returns a JavaPackage placeholder for missing classes — so force a
    real classload via Class.forName."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # noqa: SLF001
        return True
    except Exception:
        return False


# Tables whose queries do heavy PER-ROW map work (text expressions, array
# HOFs over embedding vectors).  When such a table arrives as a single
# file with one parquet row group — the testdata layout — every map stage
# runs on one core no matter the cluster size (scan splits can't cut
# inside a row group; spark.sql.files.minPartitionNum only yields empty
# splits).  That is the guide's "input skew: one huge unsplittable file →
# repartition immediately after the read" case (§2.5): one cheap shuffle
# of the payload unlocks full-parallel maps.  Guarded to fire only on
# pathologically under-split scans, so real multi-file tables at scale
# skip it; numeric tables (events, lineitem, …) are exempt — their map
# work is trivial and their first aggregate/window exchange redistributes
# anyway, so a blanket repartition would only add a shuffle.
_WIDE_MAP_TABLES = {"documents": "doc_id", "embeddings": "vec_id"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name in _WIDE_MAP_TABLES:
        cores = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < max(cores // 2, 1):
            # hash on the unique id, not round-robin: deterministic under
            # retries by construction and skips round-robin's
            # sort-before-repartition pass over the text rows (§2.5)
            df = df.repartition(cores, F.col(_WIDE_MAP_TABLES[name]))
    return df


def events_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical driver series: events as (key, ts, v) with deterministic
    null injection (fractional part < 0.3 → missing) so the gap-fill and
    NaN-skip paths are exercised.  (event_type, ts) is unique in the
    testdata, giving a total per-key order."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        F.col("event_type").alias("key"),
        F.col("ts"),
        F.when(v - F.floor(v) < 0.3, F.lit(None)).otherwise(v).alias("v"),
    )


# The same series as a DuckDB CTE — oracle side of the driver contract.
SERIES_SQL = (
    "SELECT event_type AS key, ts, "
    "CASE WHEN value - floor(value) < 0.3 THEN NULL ELSE value END AS v "
    "FROM events"
)
VALID_SQL = f"SELECT * FROM ({SERIES_SQL}) WHERE v IS NOT NULL"
