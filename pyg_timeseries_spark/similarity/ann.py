"""Similarity search over an embedding column (array<float>).

Two tiers:
* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query set
  against the corpus; the dot product is a JVM-side higher-order-function
  fold (F.aggregate over F.zip_with), so the scan stays in codegen with no
  Python in the loop.  O(Q·N·d) — the correctness baseline.
* ``lsh_topk`` — scale path: random-hyperplane (SimHash) bucketing; only
  candidates sharing a band bucket with the query are scored.  At 1000
  executors the candidate join is an equi-join on (band, bucket), a normal
  hash shuffle, reducing scored pairs by orders of magnitude.

Hyperplanes are derived deterministically from xxhash64 so both sides of the
bucket join compute identical signatures with no broadcast state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    Returns (query_id, neighbor_id, sim, rank).  Deterministic tie-break on
    neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec).cast("array<double>").alias("cv"),
    )
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---- LSH (random hyperplane / SimHash bucketing) ----------------------------

def _md5_signs(plane: int, dim: int) -> list[int]:
    """±1 hyperplane components derived from md5(f"{plane},{j}") — md5 is
    identical everywhere, so an external engine (e.g. the DuckDB oracle) can
    reproduce the exact same hyperplanes."""
    import hashlib

    return [
        1 if hashlib.md5(f"{plane},{j}".encode()).hexdigest()[0] < "8" else -1
        for j in range(dim)
    ]


def _hyperplane_bit_md5int(veccol, dim: int, plane: int):
    """Deterministic-everywhere signature bit: quantize the vector to
    integers (floor(x·1000)) and take the sign of the INTEGER projection
    onto the md5-derived ±1 hyperplane — integer sums are order-free, so
    the bucket assignment is bit-reproducible across engines regardless of
    float summation order."""
    signs = F.array(*[F.lit(s) for s in _md5_signs(plane, dim)])
    ivec = F.transform(veccol, lambda x: F.floor(x * 1000).cast("long"))
    proj = F.aggregate(
        F.zip_with(ivec, signs, lambda x, s: x * s),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))


def _hyperplane_bit(veccol, dim: int, plane: int):
    """sign(Σ_j vec[j] * h(plane, j)) as one signature bit; h is a
    deterministic ±1 hash — identical on any executor, no shared state."""
    signs = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.when(
            F.pmod(F.xxhash64(F.lit(plane), j), F.lit(2)) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0)),
    )
    proj = F.aggregate(
        F.zip_with(veccol, signs, lambda x, s: x * s),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))


def add_simhash_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    vec: str = "embedding",
    scheme: str = "xxhash",
) -> DataFrame:
    """Append `bands` bucket columns, each packing n_planes/bands sign bits.

    scheme 'xxhash' (production) or 'md5int' (cross-engine-reproducible:
    md5-derived hyperplanes + integer-quantized projections)."""
    v = F.col(vec).cast("array<double>")
    per_band = n_planes // bands
    bit_fn = _hyperplane_bit_md5int if scheme == "md5int" else _hyperplane_bit
    out = df
    for b in range(bands):
        bits = [
            bit_fn(v, dim, b * per_band + p) * (2 ** p)
            for p in range(per_band)
        ]
        bucket = bits[0]
        for x in bits[1:]:
            bucket = bucket + x
        out = out.withColumn(f"bucket_{b}", bucket)
    return out


def simhash_bucket_rows(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec: str = "embedding",
    scheme: str = "xxhash",
    out_id: str = "id",
) -> DataFrame:
    """(id, band, bucket) rows — ALL bands in one posexplode pass, and no
    vector column in the output: the candidate join then shuffles only
    3-column integer rows, never the embedding payload (which at dim 768+
    would otherwise ride the shuffle bands× over)."""
    v = F.col(vec).cast("array<double>")
    per_band = n_planes // bands
    bit_fn = _hyperplane_bit_md5int if scheme == "md5int" else _hyperplane_bit
    band_buckets = []
    for b in range(bands):
        bits = [
            bit_fn(v, dim, b * per_band + p) * (2 ** p)
            for p in range(per_band)
        ]
        bucket = bits[0]
        for x in bits[1:]:
            bucket = bucket + x
        band_buckets.append(bucket)
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(F.array(*band_buckets)).alias("band", "bucket"),
    )


def lsh_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec: str = "embedding",
    scheme: str = "xxhash",
) -> DataFrame:
    """Slim candidate pairs (query_id, neighbor_id): equi-join on
    (band, bucket) carrying ids only, then distinct.  The heavy vector
    payload re-attaches by id AFTER deduplication (lsh_topk)."""
    cbr = simhash_bucket_rows(corpus, dim, n_planes, bands, id_col, vec,
                              scheme, out_id="neighbor_id")
    qbr = simhash_bucket_rows(queries, dim, n_planes, bands, id_col, vec,
                              scheme, out_id="query_id")
    return (
        cbr.join(qbr, on=["band", "bucket"])
        .select("query_id", "neighbor_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec: str = "embedding",
    scheme: str = "xxhash",
) -> DataFrame:
    """Approximate top-k: score only candidates sharing ≥1 band bucket.

    Plan shape (the 100 TB path): bucket rows are (id, band, bucket) — the
    band join and the distinct never see an array column; vectors join back
    by id once, query side broadcast."""
    cand = lsh_candidates(corpus, queries, dim, n_planes, bands, id_col, vec,
                          scheme)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec).cast("array<double>").alias("cv"),
    )
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(c, on="neighbor_id")
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
