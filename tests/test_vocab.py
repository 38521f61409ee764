"""Vocabulary stats + TF-IDF vs a pandas-computed reference; fixed-N
stratified sampling invariants."""

import math
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from pyg_timeseries_spark.textops.corpus import sample_corpus, sample_fixed_n
from pyg_timeseries_spark.textops.vocab import (
    tfidf,
    tfidf_top_terms,
    top_words,
    vocab_counts,
)

DOCS = [
    (0, "the cat sat on the mat", "web"),
    (1, "the dog ate the cat food", "web"),
    (2, "spark shuffles the big data", "code"),
    (3, "big data big compute big bills", "code"),
    (4, "  spaced    out   text  ", "web"),
]


def _docs(spark):
    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text", "source"])
    return spark.createDataFrame(pdf)


def _expected_counts():
    c = Counter()
    for _, text, src in DOCS:
        for w in text.lower().split():
            c[(src, w)] += 1
    return c


def test_vocab_counts_match_python(spark):
    got = {
        (r["source"], r["word"]): r["cnt"]
        for r in vocab_counts(_docs(spark)).collect()
    }
    assert got == dict(_expected_counts())


def test_top_words_deterministic_tiebreak(spark):
    rows = top_words(_docs(spark), n=2).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["rank"], r["word"], r["cnt"]))
    # web: 'the' x4, then 'cat' x2; code: 'big' x4, then 'data' x2
    assert sorted(by_src["web"]) == [(1, "the", 4), (2, "cat", 2)]
    assert sorted(by_src["code"]) == [(1, "big", 4), (2, "data", 2)]
    # rank-3 would tie at cnt=1 -> alphabetical; verify via n=3
    rows3 = top_words(_docs(spark), n=3).collect()
    third = {r["source"]: r["word"] for r in rows3 if r["rank"] == 3}
    assert third == {"web": "ate", "code": "bills"}


def test_tfidf_matches_python(spark):
    n_docs = len(DOCS)
    tf = Counter()
    dfreq = Counter()
    for did, text, _ in DOCS:
        ws = text.lower().split()
        for w in ws:
            tf[(did, w)] += 1
        for w in set(ws):
            dfreq[w] += 1
    got = {
        (r["doc_id"], r["word"]): (r["tf"], r["df"], r["tfidf"])
        for r in tfidf(_docs(spark)).collect()
    }
    assert set(got) == set(tf)
    for (did, w), t in tf.items():
        gt, gd, gs = got[(did, w)]
        assert (gt, gd) == (t, dfreq[w])
        assert abs(gs - t * math.log(n_docs / dfreq[w])) < 1e-12


def test_tfidf_top_terms_rank(spark):
    rows = tfidf_top_terms(_docs(spark), n=1).collect()
    top = {r["doc_id"]: r["word"] for r in rows}
    assert len(top) == len(DOCS)
    # doc 3: 'big' tf=3 dominates everything else
    assert top[3] == "big"


def test_sample_fixed_n_exact_size_and_nesting(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            "source": ["a" if i % 2 else "b" for i in range(200)],
        }
    )
    docs = spark.createDataFrame(pdf)
    s10 = sample_fixed_n(docs, 10, seed=3)
    s5 = sample_fixed_n(docs, 5, seed=3)
    c10 = s10.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in c10} == {"a": 10, "b": 10}
    ids10 = {r["doc_id"] for r in s10.collect()}
    ids5 = {r["doc_id"] for r in s5.collect()}
    assert ids5 < ids10  # shrinking n nests
    # deterministic across recomputation
    assert ids10 == {r["doc_id"] for r in sample_fixed_n(docs, 10, seed=3).collect()}
    # different seed -> different sample (overwhelmingly)
    assert ids10 != {r["doc_id"] for r in sample_fixed_n(docs, 10, seed=4).collect()}


def test_lm_xent_separates_gibberish(spark):
    """Fluent-corpus docs must score lower cross-entropy than a gibberish
    doc under a model trained on the fluent corpus; probabilities are a
    proper distribution (xent > 0); unseen-context fallback works."""
    import pandas as pd

    from pyg_timeseries_spark.textops.lm import (
        char_bigram_counts, perplexity_score,
    )

    fluent = [
        (i, "the quick brown fox jumps over the lazy dog again and again")
        for i in range(8)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(fluent, columns=["doc_id", "text"])
    )
    model = char_bigram_counts(docs)
    test = spark.createDataFrame(
        pd.DataFrame(
            fluent[:1] + [(99, "zqxj vw kk qq zz xx jj ww qzqzqz xjxjxj")],
            columns=["doc_id", "text"],
        )
    )
    out = {r["doc_id"]: r["xent"] for r in
           perplexity_score(test, model).collect()}
    assert 0 < out[0] < out[99]


def test_lm_degenerate_docs_and_empty_model(spark):
    """Empty / whitespace / 1-char docs must not crash the bigram path
    (Spark 4 ANSI mode: element_at(a, 2) on a 1-element char array throws
    unless guarded); they simply contribute no bigrams.  An empty model
    raises a clear ValueError, not ZeroDivisionError at plan-build."""
    import pandas as pd
    import pytest as pt

    from pyg_timeseries_spark.textops.lm import (
        char_bigram_counts, perplexity_score,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (0, "the quick brown fox"),
                (1, ""),          # empty
                (2, "   "),       # whitespace-only → trimmed empty
                (3, "x"),         # single char
                (4, None),        # null text
                (5, "ab"),        # minimal 1-bigram doc
            ],
            columns=["doc_id", "text"],
        )
    )
    model = char_bigram_counts(docs)   # must not throw under ANSI
    counts = {(r["prev"], r["cur"]): r["n"] for r in model.collect()}
    assert counts[("a", "b")] >= 1 and ("x", "x") not in counts

    out = {r["doc_id"]: r for r in perplexity_score(docs, model).collect()}
    assert out[0]["xent"] > 0 and out[5]["n_bigrams"] == 1
    for deg in (1, 2, 3, 4):
        assert deg not in out  # no bigrams → no score row

    empty = model.filter(F.lit(False))
    with pt.raises(ValueError, match="empty bigram model"):
        perplexity_score(docs, empty)


def test_lm_shuffle_join_fallback_matches_broadcast(spark):
    """Above the broadcast-rows threshold perplexity_score must fall back
    to a shuffle join and produce identical scores (CJK-scale charset²
    guard — a forced broadcast of a huge model would OOM the driver)."""
    import pandas as pd

    from pyg_timeseries_spark.textops.lm import (
        char_bigram_counts, perplexity_score,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            [(i, f"doc number {i} with some shared text body") for i in range(6)],
            columns=["doc_id", "text"],
        )
    )
    model = char_bigram_counts(docs)
    a = perplexity_score(docs, model).collect()
    b = perplexity_score(docs, model, broadcast_rows=0).collect()
    key = lambda r: r["doc_id"]
    for ra, rb in zip(sorted(a, key=key), sorted(b, key=key)):
        assert ra["doc_id"] == rb["doc_id"]
        assert abs(ra["xent"] - rb["xent"]) < 1e-12
        assert ra["n_bigrams"] == rb["n_bigrams"]
