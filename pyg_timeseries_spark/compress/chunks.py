"""Spark plumbing for Gorilla-compressed series chunks.

A downsampled series (e.g. the 1m rollup's sum_n_tok per source) is packed
into one BinaryType blob per (source, chunk_window) — delta-of-delta
timestamps + XOR-compressed values — and unpacked back losslessly.  Encode
and decode run as Arrow-batched grouped pandas UDFs; blobs live in the
rollup store like any other table, so the state/retention machinery applies.

Chunking by a coarse window (default 1 day per chunk) bounds blob size and
preserves partition pruning: a time-range query only decodes the chunks whose
window overlaps.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyg_timeseries_spark.compress import gorilla


def compress_series(
    df: DataFrame,
    key: str = "source",
    ts: str = "bucket",
    v: str = "sum_n_tok",
    chunk: str = "day",
) -> DataFrame:
    """(key, ts, v) rows → (key, chunk_start, n_points, blob) rows."""
    out_schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField("chunk_start", T.TimestampType()),
            T.StructField("n_points", T.LongType()),
            T.StructField("blob", T.BinaryType()),
        ]
    )
    src = df.select(
        F.col(key), F.col(ts).alias("_ts"), F.col(v).cast("double").alias("_v"),
        F.date_trunc(chunk, F.col(ts)).alias("chunk_start"),
    )

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts")
        ts_int = pdf["_ts"].astype("int64").to_numpy() // 1_000_000_000
        blob = gorilla.encode_chunk(ts_int, pdf["_v"].to_numpy())
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "chunk_start": [pdf["chunk_start"].iloc[0]],
                "n_points": [len(pdf)],
                "blob": [blob],
            }
        )

    return src.groupBy(key, "chunk_start").applyInPandas(enc, schema=out_schema)


def decompress_series(
    chunks: DataFrame,
    key: str = "source",
    ts_name: str = "bucket",
    v_name: str = "sum_n_tok",
) -> DataFrame:
    """Inverse of compress_series — exact round-trip."""
    out_schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField(ts_name, T.TimestampType()),
            T.StructField(v_name, T.DoubleType()),
        ]
    )

    def dec(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, row in pdf.iterrows():
            ts_int, vals = gorilla.decode_chunk(bytes(row["blob"]))
            frames.append(
                pd.DataFrame(
                    {
                        key: row[key],
                        ts_name: pd.to_datetime(ts_int, unit="s"),
                        v_name: vals,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    return chunks.groupBy(key, "chunk_start").applyInPandas(dec, schema=out_schema)


def compression_report(chunks: DataFrame) -> DataFrame:
    """bytes-per-point diagnostics (raw float64+int64 = 16 bytes/point)."""
    return chunks.select(
        "n_points",
        F.length("blob").alias("bytes"),
        (F.length("blob") / F.col("n_points")).alias("bytes_per_point"),
    ).agg(
        F.sum("n_points").alias("points"),
        F.sum("bytes").alias("bytes"),
        (F.sum("bytes") / F.sum("n_points")).alias("bytes_per_point"),
        F.lit(16.0).alias("raw_bytes_per_point"),
    )
