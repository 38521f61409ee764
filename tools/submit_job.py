"""spark-submit entry point (north-rule run mode): packages the engine and
runs the rollup cascade + a resumable EWM pass as a submitted application.

Usage (local evidence; on a real cluster swap --master):

    python tools/make_pyfiles.py           # builds /tmp/pyg_ts_spark.zip
    spark-submit --master local[8] \
        --py-files /tmp/pyg_ts_spark.zip \
        tools/submit_job.py --rows 2000000 --store /tmp/pyg_ts_store

Prints one JSON line with per-tier rollup counts and points/sec.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--store", default="/tmp/pyg_ts_store")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pyg_ts_rollup_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pyg_timeseries_spark.datagen import sequences
    from pyg_timeseries_spark.operators.ewm import ewma_
    from pyg_timeseries_spark.plans.pipeline import TimeseriesEngine

    raw = sequences(spark, args.rows, with_tokens=False).persist()
    n_raw = raw.count()
    eng = TimeseriesEngine(spark, args.store)
    t0 = time.time()
    tiers = eng.ingest(raw, tokens=None)
    counts = {t: df.count() for t, df in tiers.items()}
    ingest_sec = time.time() - t0
    t0 = time.time()
    ewm_rows = eng.apply(ewma_, "1m", "ewma10", n=10).count()
    ewm_sec = time.time() - t0
    print(json.dumps({
        "raw_rows": n_raw,
        "tier_rows": counts,
        "ingest_sec": round(ingest_sec, 3),
        "ingest_points_per_sec": round(n_raw / ingest_sec),
        "ewma_rows": ewm_rows,
        "ewma_sec": round(ewm_sec, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
