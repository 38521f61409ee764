"""Versioned rollup + state store with exact incremental refresh.

This is the engine's rendition of the reference's ``persist_data`` incremental
driver (/root/reference/src/pyg_timeseries/_decorators.py:246-330): keep the
rolled-up history, a high-watermark, and per-operator (data, state) rows;
a new batch only touches buckets at/after the watermark, and the result is
bit-identical to recomputing from all raw rows (CI-enforced invariant,
SURVEY.md §7.0).

Storage is a tiny snapshot-versioned parquet layout (an Iceberg-shaped
contract: atomic pointer swap to an immutable snapshot, time-travel by
version).  When Iceberg jars are on the classpath the same operations map to
``writeTo(...).append()`` / ``MERGE INTO`` — gated behind an import-try in
sources/tables.py; the sandbox image has no Iceberg runtime, so the parquet
backend is the tested path.

Layout::

    store/
      meta.json                  # {tier: {version, watermark_ts}}
      rollup_1m/v{N}/*.parquet   # immutable snapshots
      state/{op}/v{N}/*.parquet  # operator state rows (key, state[])
      lineage/*.parquet          # per-batch per-partition row counts
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyg_timeseries_spark.plans.rollup import (
    merge_rollup, rollup_cascade, rollup_from_raw,
)


class RollupStore:
    def __init__(self, path: str, spark: SparkSession):
        self.path = path
        self.spark = spark
        os.makedirs(path, exist_ok=True)
        self.meta_path = os.path.join(path, "meta.json")
        self.meta = self._load_meta()

    # -- meta ---------------------------------------------------------------
    def _load_meta(self) -> dict:
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                return json.load(f)
        return {"tables": {}, "batches": 0}

    def _save_meta(self) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.meta, f, indent=1)
        os.replace(tmp, self.meta_path)  # atomic pointer swap

    # -- snapshot io --------------------------------------------------------
    def _table_dir(self, name: str, version: int) -> str:
        return os.path.join(self.path, name, f"v{version}")

    def write_table(self, name: str, df: DataFrame) -> int:
        cur = self.meta["tables"].get(name, {}).get("version", 0)
        new = cur + 1
        df.write.mode("overwrite").parquet(self._table_dir(name, new))
        self.meta["tables"].setdefault(name, {})["version"] = new
        self._save_meta()
        return new

    def read_table(self, name: str, version: int | None = None) -> DataFrame | None:
        info = self.meta["tables"].get(name)
        if not info:
            return None
        v = version or info["version"]
        return self.spark.read.parquet(self._table_dir(name, v))

    # -- lineage ------------------------------------------------------------
    def record_lineage(self, batch_id: int, stage: str, df: DataFrame) -> None:
        """Per-partition row counts for the stage input — every stage emits
        lineage (north_rule).  One tiny parquet append per batch."""
        counts = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("batch_id", F.lit(batch_id))
            .withColumn("stage", F.lit(stage))
            .withColumn("wall_ts", F.lit(time.time()))
        )
        counts.write.mode("append").parquet(os.path.join(self.path, "lineage"))

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "lineage"))

    # -- the incremental driver --------------------------------------------
    def ingest(
        self,
        raw: DataFrame,
        ts: str = "ts",
        v: str = "n_tok",
        tokens: str | None = "tokens",
        key: str = "source",
        with_lineage: bool = True,
        exact_rebuild: bool = False,
    ) -> dict[str, DataFrame]:
        """Append a raw batch: roll it up, merge into each tier, snapshot.

        Exactness argument: all tier measures are associative and the merge
        algebra equals the from-scratch aggregation (plans/rollup.py), so
        ingest(head); ingest(tail) == ingest(full) row-for-row including
        token arrays (append contract: batches arrive time-ordered per key).

        ``exact_rebuild`` lifts the append contract entirely: raw batches
        are retained in the store and any 1m bucket touched by BOTH history
        and this batch (an interleaving late arrival) is recomputed from
        retained raw — token order then matches a full recompute under
        arbitrary out-of-order arrival, at the cost of raw retention.
        """
        batch_id = self.meta["batches"] + 1
        if with_lineage:
            self.record_lineage(batch_id, "raw", raw)
        if exact_rebuild:
            raw.write.mode("append").parquet(os.path.join(self.path, "raw"))
        delta = rollup_from_raw(raw, "1m", ts=ts, v=v, tokens=tokens, key=key)
        out: dict[str, DataFrame] = {}
        child = delta
        rebuilt = False
        for tier in ("1m", "1h", "1d"):
            if tier != "1m":
                child = rollup_cascade(prev_delta, tier, with_tokens=tokens is not None)
            existing = self.read_table(f"rollup_{tier}")
            if rebuilt:
                # the parent tier was corrected wholesale → the cascade of
                # the corrected FULL parent (prev_delta) REPLACES this tier
                merged = child
            else:
                merged = (
                    merge_rollup(existing, child, with_tokens=tokens is not None)
                    if existing is not None
                    else child
                )
            if tier == "1m" and exact_rebuild and existing is not None:
                corrected = self._rebuild_overlaps(
                    merged, existing, child, ts=ts, v=v, tokens=tokens, key=key
                )
                if corrected is not merged:
                    merged = corrected
                    rebuilt = True
                    # cascade downstream from the corrected full 1m tier
                    child = merged
            self.write_table(f"rollup_{tier}", merged)
            out[tier] = self.read_table(f"rollup_{tier}")
            # next tier cascades from: the corrected FULL tier after a
            # rebuild, else just this batch's tier delta
            prev_delta = out[tier] if rebuilt else child
        self.meta["batches"] = batch_id
        self._save_meta()
        return out

    def _rebuild_overlaps(self, merged, existing, delta, ts, v, tokens, key):
        """Recompute from retained raw the (source, bucket) cells present in
        both history and the new delta — the only cells where a concat-order
        merge can diverge from a full recompute."""
        overlaps = (
            existing.select("source", "bucket")
            .join(delta.select("source", "bucket"), ["source", "bucket"], "inner")
            .distinct()
        )
        if overlaps.isEmpty():
            return merged
        raw_all = self.spark.read.parquet(os.path.join(self.path, "raw"))
        from pyg_timeseries_spark.plans.rollup import bucket_col

        affected_raw = (
            raw_all.withColumn("_b", bucket_col(ts, "1m"))
            .join(
                F.broadcast(
                    overlaps.select(
                        F.col("source").alias("_os"), F.col("bucket").alias("_ob")
                    )
                ),
                (F.col(key) == F.col("_os")) & (F.col("_b") == F.col("_ob")),
                "left_semi",
            )
            .drop("_b")
        )
        rebuilt = rollup_from_raw(affected_raw, "1m", ts=ts, v=v,
                                  tokens=tokens, key=key)
        untouched = merged.join(
            F.broadcast(overlaps), ["source", "bucket"], "left_anti"
        )
        return untouched.unionByName(rebuilt)

    # -- operator state -----------------------------------------------------
    def write_state(self, op: str, state_df: DataFrame) -> int:
        return self.write_table(f"state_{op}", state_df)

    def read_state(self, op: str) -> DataFrame | None:
        return self.read_table(f"state_{op}")

    # -- retention ----------------------------------------------------------
    def expire(self, tier: str, keep_buckets: int) -> None:
        """Tier TTL: keep only the newest ``keep_buckets`` buckets per source
        (finer tiers retain less history — the retention pyramid)."""
        from pyspark.sql import Window

        name = f"rollup_{tier}"
        cur = self.read_table(name)
        if cur is None:
            return
        w = Window.partitionBy("source").orderBy(F.col("bucket").desc())
        kept = (
            cur.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= keep_buckets)
            .drop("_rn")
        )
        self.write_table(name, kept)

    def expire_snapshots(self, keep: int = 2) -> None:
        """Drop old snapshot dirs (Iceberg expire_snapshots equivalent)."""
        import shutil

        for name, info in self.meta["tables"].items():
            cur = info["version"]
            base = os.path.join(self.path, name)
            if not os.path.isdir(base):
                continue
            for d in os.listdir(base):
                if d.startswith("v") and d[1:].isdigit() and int(d[1:]) <= cur - keep:
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)
