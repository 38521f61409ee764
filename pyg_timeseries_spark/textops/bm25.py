"""BM25 relevance scoring of the corpus against a (small) query term
set — the retrieval-style scorer a training-data pipeline uses to mine
topical subsets ("find the docs most about X") or to build targeted
eval slices.

Okapi BM25 (Robertson & Zaragoza 2009, §3.3):

    score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·dl/avgdl))
    idf(t)      = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

Scale shape — the corpus text NEVER shuffles:

* per-doc length dl = whitespace token count, a map-side projection;
* term frequencies restrict to the query terms BEFORE any aggregate
  (an isin filter against the broadcast-literal term list), so the
  (doc, term) shuffle carries only query-term hits;
* document frequencies reuse the same filtered explode (distinct →
  count per term — at most |terms| output rows);
* N and avgdl ride a broadcast single-row frame (the textops/vocab.py
  tfidf pattern — no driver-side .count() action in the plan);
* the df table and the scored join key on ``word`` with at most
  |terms| distinct values — broadcast.

The reference engine has no text surface; this extends SURVEY.md §2.9
alongside tfidf (textops/vocab.py:77).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyg_timeseries_spark.textops.vocab import doc_terms


def bm25_score(
    docs: DataFrame,
    terms: list[str],
    text: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
    out: str = "bm25",
) -> DataFrame:
    """Per matching document: (id, n_hits, bm25) — docs containing none
    of ``terms`` are absent (their score is 0 by definition).  ``terms``
    must be a small literal list (it broadcasts as an isin filter and a
    tiny join side); tokenisation is the whitespace split shared with
    tfidf so both scorers agree on dl and tf."""
    if not terms:
        raise ValueError("bm25_score: empty query term set")
    terms = [t.lower() for t in terms] if lowercase else list(terms)

    # corpus constants: N docs, average whitespace-token doc length
    from pyg_timeseries_spark.textops.analysis import WS
    t = F.trim(F.col(text))
    if lowercase:
        t = F.lower(t)
    with_dl = docs.select(
        F.col(id_col).alias("id"),
        F.size(F.filter(F.split(t, WS), lambda w: F.length(w) > 0))
        .cast("double").alias("dl"),
    )
    consts = with_dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("dl").alias("__avgdl"),
    )

    hits = (
        doc_terms(docs, text=text, id_col=id_col, lowercase=lowercase)
        .filter(F.col("word").isin(terms))
        .select(F.col(id_col).alias("id"), "word")
    )
    tf = hits.groupBy("id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = (
        hits.distinct()
        .groupBy("word").agg(F.count(F.lit(1)).cast("double").alias("df"))
    )

    idf = F.log(
        (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl")
    )
    contrib = idf * F.col("tf").cast("double") * F.lit(k1 + 1.0) / denom
    scored = (
        tf.join(F.broadcast(df_tbl), "word")
        .join(F.broadcast(consts))
        .join(with_dl, "id")
        .select("id", "word", contrib.alias("__s"))
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.sum("__s").alias(out),
    ).select(F.col("id").alias(id_col), "n_hits", out)
