"""Incremental deduplication against a persistent signature store — the
production shape for a continuously-ingested training corpus: each new
batch dedups against EVERYTHING seen so far without ever reprocessing the
historical corpus text.

State per seen document is one slim row (id, md5(text), MinHash signature,
band buckets) — the corpus text itself is never stored or re-read.  The
per-batch cost is: signature map work over the batch (pipelined with its
scan), one anti-join on the exact hash, and one band-bucket join of batch
rows against the store's (bucket, id) rows.  At web scale the signature
table is n_docs × (16 longs) — petabytes of text become terabytes of
signatures; production layouts would additionally bucket the store by band
hash so the candidate join partition-prunes.

Drop rule (same greedy order-based rule as neardup.minhash_dedup, made
incremental-safe): a document is dropped iff
  * some EARLIER document (smaller id, in this or any prior batch) has the
    same md5(text)  — exact duplicate; or
  * it shares ≥1 MinHash band bucket with an earlier document AND the
    signature agreement fraction (the standard MinHash Jaccard estimate)
    is ≥ ``threshold``.
Dropped documents' signatures STAY in the store (an edge to a dropped doc
still drops you) — this makes the rule associative:
``add_batch(b1); add_batch(b2)`` ≡ one-shot over ``b1 ∪ b2`` whenever ids
in later batches are larger (the append contract).

Reference scope note: the reference engine has no dedup layer; this module
extends the pipeline the same way dedup/neardup.py does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalDeduper:
    def __init__(
        self,
        path: str,
        spark: SparkSession,
        n_hashes: int = 16,
        bands: int = 8,
        threshold: float = 0.5,
        shingle_k: int = 3,
        hash_fn: str = "xxhash64",
    ):
        self.path = path
        self.spark = spark
        self.n_hashes = n_hashes
        self.bands = bands
        self.rows = n_hashes // bands
        self.threshold = threshold
        self.shingle_k = shingle_k
        self.hash_fn = hash_fn
        os.makedirs(path, exist_ok=True)
        self._sig_dir = os.path.join(path, "sigs")

    # -- signature construction (same families as dedup/neardup.py) ---------
    def _signatures(self, docs: DataFrame, id_col: str, text: str) -> DataFrame:
        """(id, h_exact, h0..h{n-1}, b0..b{bands-1}) — one slim row/doc."""
        from pyg_timeseries_spark.dedup.neardup import word_shingles

        sh = docs.select(
            F.col(id_col).alias("id"),
            F.md5(F.col(text)).alias("h_exact"),
            word_shingles(F.col(text), self.shingle_k).alias("sh"),
        )
        rows = sh.select("id", "h_exact", F.explode("sh").alias("s"))
        if self.hash_fn == "md5":
            aggs = [
                F.min(F.md5(F.concat(F.col("s"), F.lit(f"|{p}")))).alias(f"h{p}")
                for p in range(self.n_hashes)
            ]
        else:
            aggs = [
                F.min(F.xxhash64(F.col("s"), F.lit(p))).alias(f"h{p}")
                for p in range(self.n_hashes)
            ]
        sig = rows.groupBy("id", "h_exact").agg(*aggs)
        band_cols = []
        for b in range(self.bands):
            parts = [
                F.col(f"h{b * self.rows + r}").cast("string")
                for r in range(self.rows)
            ]
            if self.hash_fn == "md5":
                band_cols.append(F.md5(F.concat_ws(",", *parts)).alias(f"b{b}"))
            else:
                band_cols.append(
                    F.xxhash64(F.concat_ws(",", *parts), F.lit(b)).alias(f"b{b}")
                )
        return sig.select("id", "h_exact",
                          *[F.col(f"h{p}") for p in range(self.n_hashes)],
                          *band_cols)

    def _stored(self) -> DataFrame | None:
        if not os.path.exists(os.path.join(self._sig_dir, "_SUCCESS")):
            return None
        return self.spark.read.parquet(self._sig_dir)

    # -- the incremental step -----------------------------------------------
    def add_batch(self, docs: DataFrame, id_col: str = "doc_id",
                  text: str = "text") -> DataFrame:
        """Dedup ``docs`` against the store + itself and append the batch's
        signatures.  Returns (id, dropped, reason) for every batch doc
        (reason 'exact' | 'near' | NULL)."""
        sig_b = self._signatures(docs, id_col, text).persist()
        prev = self._stored()
        earlier = (
            sig_b if prev is None
            else prev.unionByName(sig_b)
        )

        # exact layer: an earlier doc with the same content hash
        ex = earlier.select(F.col("id").alias("e_id"),
                            F.col("h_exact").alias("e_h"))
        exact_drop = (
            sig_b.join(ex, (F.col("h_exact") == F.col("e_h"))
                       & (F.col("e_id") < F.col("id")), "left_semi")
            .select("id").withColumn("reason", F.lit("exact"))
        )

        # near layer: band-bucket candidates vs earlier docs, verified by
        # signature agreement ≥ threshold.  Slim join: only (band, bucket,
        # id) rows shuffle; full signatures re-attach per candidate side.
        def buckets(sdf, prefix):
            return sdf.select(
                F.col("id").alias(f"{prefix}id"),
                F.posexplode(
                    F.array(*[F.col(f"b{b}") for b in range(self.bands)])
                ).alias("band", "bucket"),
            )

        cand = (
            buckets(sig_b, "").join(buckets(earlier, "e_"), ["band", "bucket"])
            .filter(F.col("e_id") < F.col("id"))
            .select("id", "e_id").distinct()
        )
        hcols = [f"h{p}" for p in range(self.n_hashes)]
        sb = sig_b.select("id", *hcols)
        se = earlier.select(
            F.col("id").alias("e_id"),
            *[F.col(h).alias(f"e_{h}") for h in hcols],
        )
        agree = sum(
            F.when(F.col(h) == F.col(f"e_{h}"), 1).otherwise(0) for h in hcols
        )
        near_drop = (
            cand.join(sb, "id").join(se, "e_id")
            .withColumn("_est", agree / F.lit(float(self.n_hashes)))
            .filter(F.col("_est") >= self.threshold)
            .select("id").distinct().withColumn("reason", F.lit("near"))
        )

        dropped = exact_drop.unionByName(near_drop).groupBy("id").agg(
            F.min("reason").alias("reason")  # 'exact' < 'near' — exact wins
        )
        out = (
            sig_b.select("id").join(dropped, "id", "left")
            .select(
                F.col("id").alias(id_col),
                F.col("reason").isNotNull().alias("dropped"),
                "reason",
            )
        )
        out = out.persist()
        out.count()  # materialize the verdicts BEFORE the store grows
        sig_b.write.mode("append").parquet(self._sig_dir)
        sig_b.unpersist()
        return out

    def kept(self, verdicts: DataFrame, docs: DataFrame,
             id_col: str = "doc_id") -> DataFrame:
        """The surviving documents of a batch given its verdict frame."""
        keep_ids = verdicts.filter(~F.col("dropped")).select(id_col)
        return docs.join(keep_ids, id_col, "left_semi")
