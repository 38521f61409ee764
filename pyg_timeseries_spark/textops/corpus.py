"""Corpus curation ops: benchmark decontamination and deterministic
sampling — the two remaining standard steps of a training-data build
(alongside dedup/, textops/analysis.py quality, and textops/packing.py).

Both are pure column-expression plans (no UDFs):

* ``contaminated_docs`` — flag documents sharing any word k-shingle with a
  probe set (eval benchmarks).  Probe shingles are broadcast (benchmarks
  are tiny vs the corpus); document shingles explode map-side and
  semi-join — the corpus never shuffles on anything wider than one
  shingle string.
* ``sample_corpus`` — per-source Bernoulli sampling with a DETERMINISTIC
  md5-derived coin per document: the same (doc, seed) always lands on the
  same side on any cluster, so a corpus mix is reproducible and
  composable (rates are exact in expectation, hash-uniform per doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyg_timeseries_spark.dedup.neardup import word_shingles


def contaminated_docs(
    docs: DataFrame,
    probes: DataFrame,
    shingle_k: int = 8,
    id_col: str = "doc_id",
    text: str = "text",
    probe_text: str = "text",
) -> DataFrame:
    """(id, n_hits) for every document sharing ≥1 word ``shingle_k``-gram
    with any probe document — the standard n-gram decontamination test.
    ``n_hits`` counts the doc's DISTINCT contaminated shingles."""
    probe_sh = probes.select(
        F.explode(word_shingles(F.col(probe_text), shingle_k)).alias("s")
    ).distinct()
    doc_sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text), shingle_k)).alias("s"),
    )
    return (
        doc_sh.join(F.broadcast(probe_sh), "s")
        .groupBy("id")
        .agg(F.count_distinct("s").alias("n_hits"))
        .select(F.col("id").alias(id_col), "n_hits")
    )


def decontaminate(docs: DataFrame, probes: DataFrame, shingle_k: int = 8,
                  id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Documents with NO shingle overlap against the probe set."""
    hits = contaminated_docs(docs, probes, shingle_k, id_col, text)
    return docs.join(hits.select(id_col), id_col, "left_anti")


def _coin(id_col, seed: int):
    """Uniform [0, 1e6) integer from md5 — deterministic and reproducible
    in any engine (same trick as the md5 hash families in dedup/)."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"),
                               F.lit(f"|{seed}"))), 1, 8
            ), 16, 10,
        ).cast("long"),
        F.lit(1_000_000),
    )


def sample_corpus(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
    id_col: str = "doc_id",
    source: str = "source",
) -> DataFrame:
    """Deterministic per-source Bernoulli sample: a doc survives iff its
    md5 coin < rate(source)·1e6.  Sources absent from ``rates`` use
    ``default_rate``.  Reproducible on any cluster / engine."""
    rate = F.lit(int(default_rate * 1_000_000))
    for src, r in sorted(rates.items()):
        rate = F.when(F.col(source) == src, F.lit(int(r * 1_000_000))).otherwise(rate)
    return docs.filter(_coin(id_col, seed) < rate)


def sample_fixed_n(
    docs: DataFrame,
    n: int,
    seed: int = 0,
    id_col: str = "doc_id",
    source: str = "source",
) -> DataFrame:
    """Exact-size stratified sample: the ``n`` documents per source with the
    smallest md5 coins (ties broken by id).  Unlike Bernoulli sampling the
    output size is exact, and it is still deterministic, reproducible, and
    composable — shrinking ``n`` yields a subset of the larger sample.

    Scale shape: row_number ≤ n over (source ORDER BY coin, id) becomes a
    WindowGroupLimit — each map task keeps a local top-n heap, so at most
    n rows per source per task reach the exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy(source).orderBy(_coin(id_col, seed).asc(),
                                           F.col(id_col).asc())
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def split_corpus(
    docs: DataFrame,
    fractions: dict[str, float],
    seed: int = 0,
    id_col: str = "doc_id",
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each doc's md5 coin falls
    into cumulative fraction bands, so the labeling is (a) reproducible on
    any cluster or engine, (b) stable under corpus growth — a doc's split
    never changes when other docs are added or removed — and (c) disjoint
    and exhaustive when the fractions sum to 1 (validated).

    ``fractions`` is ordered by sorted key for a canonical band layout,
    e.g. {"test": 0.1, "train": 0.8, "val": 0.1} → test=[0,0.1),
    train=[0.1,0.9), val=[0.9,1)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    coin = _coin(id_col, seed)
    expr = None
    acc = 0.0
    for name, frac in sorted(fractions.items()):
        acc += frac
        hi = F.lit(min(int(round(acc * 1_000_000)), 1_000_000))
        expr = (
            F.when(coin < hi, F.lit(name)) if expr is None
            else expr.when(coin < hi, F.lit(name))
        )
    return docs.withColumn(out, expr)
