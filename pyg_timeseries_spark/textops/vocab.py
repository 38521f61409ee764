"""Vocabulary statistics + TF-IDF over the documents table — the corpus
token-frequency analytics a training-data build runs before choosing
tokenizer vocab / filtering boilerplate.

All JVM-side column expressions (explode + hash aggregates + windows —
no Python UDFs).  Scale shape:

* ``vocab_counts`` is the canonical word count: explode pipelines with
  the parquet scan inside whole-stage codegen, and the groupBy(by, word)
  does map-side partial aggregation — the shuffle carries one row per
  distinct (group, word) per map task, not per token occurrence.
* ``top_words`` filters with row_number ≤ n, which Spark rewrites to
  WindowGroupLimit: a per-partition top-n heap runs BEFORE the exchange.
* ``tfidf`` joins the per-(doc, word) term counts against the per-word
  document frequencies on ``word`` — a plain hash join keyed on the
  vocabulary, orders of magnitude smaller than the corpus.  The corpus
  size N enters as a broadcast single-row frame (no driver .count()
  action baked into the plan).

Deterministic: ordering ties break on the word itself, so top-k is
reproducible across engines (oracle-checked vs DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyg_timeseries_spark.textops.analysis import WS


def doc_terms(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
    lowercase: bool = True,
) -> DataFrame:
    """(id, word) pairs — one row per token occurrence."""
    t = F.trim(F.col(text))
    if lowercase:
        t = F.lower(t)
    return (
        docs.select(id_col, *extra_cols, F.explode(F.split(t, WS)).alias("word"))
        .filter(F.length("word") > 0)
    )


def vocab_counts(
    docs: DataFrame,
    by: str = "source",
    text: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Word frequency table per ``by`` group: (by, word, cnt)."""
    terms = doc_terms(docs, text, id_col=by, lowercase=lowercase)
    return terms.groupBy(by, "word").agg(F.count(F.lit(1)).alias("cnt"))


def top_words(
    docs: DataFrame,
    n: int = 10,
    by: str = "source",
    text: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Top-``n`` words per group by count, deterministic tie-break on the
    word (count DESC, word ASC)."""
    counts = vocab_counts(docs, by=by, text=text, lowercase=lowercase)
    w = Window.partitionBy(by).orderBy(F.col("cnt").desc(), F.col("word").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


def tfidf(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Per (doc, word): raw term frequency ``tf``, document frequency
    ``df``, and ``tfidf = tf * ln(N / df)`` with N = corpus size.

    Plain raw-count / natural-log convention — deterministic double
    arithmetic reproducible in the DuckDB oracle."""
    terms = doc_terms(docs, text, id_col=id_col, lowercase=lowercase)
    tf = terms.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = (
        terms.select(id_col, "word").distinct()
        .groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("__n"))
    return (
        tf.join(df_tbl, "word")
        .join(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("__n") / F.col("df")))
        .drop("__n")
        .select(id_col, "word", "tf", "df", "tfidf")
    )


def tfidf_top_terms(
    docs: DataFrame,
    n: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """The ``n`` most characteristic terms per document (tfidf DESC, word
    ASC — deterministic)."""
    scored = tfidf(docs, text=text, id_col=id_col, lowercase=lowercase)
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("word").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


def token_entropy(
    docs: DataFrame,
    by: str = "source",
    text: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Shannon entropy (nats) of the word distribution per ``by`` group —
    the diversity statistic corpus-mixing decisions use (a low-entropy
    source is repetitive/templated).  Two hash aggregates: the map-side-
    combined wordcount, then per-group −Σ (c/N)·ln(c/N) with N folded in
    as Σc ln c / N algebra so a single pass over the count rows suffices:
    H = ln N − (Σ c·ln c)/N."""
    counts = vocab_counts(docs, by=by, text=text, lowercase=lowercase)
    agg = counts.groupBy(by).agg(
        F.sum("cnt").alias("n_tokens"),
        F.sum(F.col("cnt") * F.log(F.col("cnt"))).alias("sum_clnc"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    return agg.select(
        by, "n_tokens", "n_distinct",
        (F.log("n_tokens") - F.col("sum_clnc") / F.col("n_tokens")).alias(
            "entropy"
        ),
    )


def build_vocab(
    docs: DataFrame,
    size: int = 1000,
    text: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-global token vocabulary: the ``size`` most frequent tokens
    with contiguous ids 1..size by rank (count DESC, token ASC tie-break
    — deterministic on any engine); id 0 is reserved for unknown.
    Returns (word, cnt, id)."""
    counts = (
        doc_terms(docs, text, id_col="doc_id", lowercase=lowercase)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # orderBy + limit compiles to TakeOrderedAndProject — distributed
    # map-side partial top-k, never a full sort of the token universe;
    # the global row_number then runs over only `size` rows.
    top = counts.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(size)
    w = Window.orderBy(F.col("cnt").desc(), F.col("word").asc())
    return top.withColumn("id", F.row_number().over(w))


def encode_tokens(
    docs: DataFrame,
    vocab: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    out: str = "ids",
) -> DataFrame:
    """Tokenize-and-encode: map each document's whitespace tokens to
    vocabulary ids (unknown → 0), preserving token order — the
    text→training-ids step of an LLM data pipeline.

    Scale shape: posexplode to slim (doc, pos, word) rows, BROADCAST
    vocab join (the vocab is tiny by construction), then ONE shuffle of
    (doc, pos, id) integer rows re-assembles per-doc arrays via
    sort_array on the (pos, id) struct — the document TEXT never
    shuffles, only integer ids do.  Emits (id_col, n_tok, ids)."""
    t = F.trim(F.col(text))
    if lowercase:
        t = F.lower(t)
    toks = docs.select(
        id_col, F.posexplode(F.split(t, WS)).alias("pos", "word")
    ).filter(F.length("word") > 0)
    joined = toks.join(F.broadcast(vocab.select("word", "id")), "word", "left")
    enc = joined.select(
        id_col, F.struct(F.col("pos"), F.coalesce(F.col("id"), F.lit(0)).alias("tid")).alias("p")
    )
    return (
        enc.groupBy(id_col)
        .agg(F.sort_array(F.collect_list("p")).alias("__ps"))
        .select(
            id_col,
            F.size("__ps").alias("n_tok"),
            F.transform(F.col("__ps"), lambda s: s["tid"]).alias(out),
        )
    )
