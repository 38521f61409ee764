"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed in Arrow-batched ``mapInPandas`` pipelines.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested.  The *codec* step (actual JPEG/WAV decode)
needs libraries that are not in this container, so it is gated: with PIL/
soundfile installed the real decoders run; otherwise `decode_image` raises
NotImplementedError and the deterministic fake (`fake_decode_image`) stands
in so the distributed pipeline stays exercisable end-to-end.

At 100 TB: binary payloads never shuffle — every stage below is a map-only
pass that pipelines with the parquet scan; only the small feature vectors
move on.  `maxRecordsPerBatch` bounds Arrow batch memory; for >100 MB blobs
set `spark.sql.parquet.columnarReaderBatchSize` down as well.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _md5_mod(col_expr, salt: str, mod: int):
    """First 8 md5 hex digits mod ``mod`` — md5 is identical in every engine
    and in hashlib, so an external golden can reproduce the exact table."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(col_expr.cast("string"), F.lit(salt))), 1, 8),
            16, 10,
        ).cast("long"),
        F.lit(mod),
    )


def synthesize_media(spark, n_rows: int = 100, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table.  Every column is a pure md5/sha2
    function of media_id, reproducible bit-for-bit in plain Python (hashlib)
    — which is what makes the driver-side golden oracle possible."""
    df = spark.range(n_rows)
    payload = F.sha2(F.concat(F.lit("media"), F.col("id").cast("string")), 512)
    return df.select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.repeat(payload, payload_bytes // 128 + 1).cast("binary").alias("payload"),
        (_md5_mod(F.col("id"), ",w", 512) + 32).cast("int").alias("width"),
        (_md5_mod(F.col("id"), ",h", 512) + 32).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (_md5_mod(F.col("id"), ",f", 300) + 1).cast("int").alias("n_frames"),
    )


def golden_image_features(n_rows: int = 100, payload_bytes: int = 256) -> list[tuple]:
    """Pure-Python (hashlib + numpy, no Spark) replica of
    image_features(synthesize_media(n_rows)) — the independent oracle for the
    deterministic fake-decode pipeline.  Returns
    (media_id, mean_r, mean_g, mean_b, std_all, content_hash) tuples."""
    rows = []
    reps = payload_bytes // 128 + 1
    for i in range(n_rows):
        if i % 3 != 0:  # element_at(..., pmod(id,3)+1): images are id%3==0
            continue
        payload = (hashlib.sha512(f"media{i}".encode()).hexdigest() * reps).encode()
        w = 32 + int(hashlib.md5(f"{i},w".encode()).hexdigest()[:8], 16) % 512
        h = 32 + int(hashlib.md5(f"{i},h".encode()).hexdigest()[:8], 16) % 512
        img = fake_decode_image(payload, w, h)
        rows.append(
            (
                i,
                float(img[..., 0].mean()),
                float(img[..., 1].mean()),
                float(img[..., 2].mean()),
                float(img.std()),
                int.from_bytes(hashlib.sha256(payload).digest()[:8],
                               "little", signed=True),
            )
        )
    return rows


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real decode — requires PIL (not in this container)."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; use fake_decode_image for plumbing tests"
        ) from e


def fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: pseudo-pixels from a seeded hash of
    the payload — stable across executors/runs, shaped like the real thing."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def image_features(df: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """Per-image features (mean/std per channel + a 64-bit content hash) via
    mapInPandas — one Arrow batch in, one small feature frame out."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
            T.StructField("std_all", T.DoubleType()),
            T.StructField("content_hash", T.LongType()),
        ]
    )
    decode = decode_image if use_real_decode else fake_decode_image

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode(bytes(r.payload), int(r.width), int(r.height))
                rows.append(
                    (
                        int(r.media_id),
                        float(img[..., 0].mean()),
                        float(img[..., 1].mean()),
                        float(img[..., 2].mean()),
                        float(img.std()),
                        int.from_bytes(
                            hashlib.sha256(bytes(r.payload)).digest()[:8],
                            "little", signed=True,
                        ),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    # project to EXACTLY the columns fn reads before the Python boundary:
    # mapInPandas is opaque to Catalyst, so without the select every
    # column (kind, sample_rate, n_frames, …) is read from storage and
    # shipped through Arrow per batch (guide §4: pass only what the
    # function needs)
    imgs = df.filter(F.col("kind") == "image").select(
        "media_id", "payload", "width", "height"
    )
    return imgs.mapInPandas(fn, schema=out_schema)


def resize_image(df: DataFrame, target: int = 64) -> DataFrame:
    """Resize plumbing: emits (media_id, thumb binary) — the fake path packs
    a deterministic target×target×3 array."""
    out_schema = T.StructType(
        [T.StructField("media_id", T.LongType()), T.StructField("thumb", T.BinaryType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, thumbs = [], []
            for r in pdf.itertuples(index=False):
                img = fake_decode_image(bytes(r.payload), int(r.width), int(r.height))
                # nearest-neighbor resample (pure numpy; real path would be PIL)
                yi = np.linspace(0, img.shape[0] - 1, target).astype(int)
                xi = np.linspace(0, img.shape[1] - 1, target).astype(int)
                ids.append(int(r.media_id))
                thumbs.append(img[yi][:, xi].tobytes())
            yield pd.DataFrame({"media_id": ids, "thumb": thumbs})

    # same column-pruning-at-the-boundary rule as image_features
    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(fn, schema=out_schema)
    )


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode sampled frame indexes JVM-side;
    the per-frame decode would plug into the same mapInPandas shape."""
    vids = df.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
