"""Decontamination + deterministic sampling (textops/corpus.py)."""

import pandas as pd
from pyspark.sql import functions as F

from pyg_timeseries_spark.textops.corpus import (
    contaminated_docs, decontaminate, sample_corpus,
)

BENCH = ("what is the capital of france paris is the capital of france "
         "and home to the eiffel tower monument")


def _corpus(spark):
    rows = [
        (0, "src_a", "a clean document about spark aggregation plans with "
                     "partial and final stages over shuffled partitions"),
        (1, "src_a", "the quiz asks what is the capital of france paris is "
                     "the capital of france and home to many museums"),  # leaks 8-grams
        (2, "src_b", "another clean text describing columnar storage and "
                     "vectorized execution for analytical workloads today"),
        (3, "src_b", BENCH),  # contains the benchmark verbatim
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]))


def test_contamination_detects_verbatim_and_partial(spark):
    docs = _corpus(spark)
    probes = spark.createDataFrame(pd.DataFrame({"text": [BENCH]}))
    hits = contaminated_docs(docs, probes, shingle_k=8).toPandas()
    flagged = set(hits["doc_id"])
    assert flagged == {1, 3}
    n = hits.set_index("doc_id")["n_hits"]
    assert n[3] > n[1] >= 1  # verbatim containment hits far more shingles
    clean = decontaminate(docs, probes, shingle_k=8)
    assert set(r.doc_id for r in clean.select("doc_id").collect()) == {0, 2}


def test_sampling_deterministic_and_rate_accurate(spark):
    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("code").alias("source"),
        F.lit("x").alias("text"),
    )
    s1 = sample_corpus(docs, {"web": 0.25, "code": 0.75}, seed=7)
    s2 = sample_corpus(docs, {"web": 0.25, "code": 0.75}, seed=7)
    a = sorted(r.doc_id for r in s1.select("doc_id").collect())
    assert a == sorted(r.doc_id for r in s2.select("doc_id").collect())
    counts = s1.groupBy("source").count().toPandas().set_index("source")["count"]
    assert abs(counts["web"] / 10_000 - 0.25) < 0.02
    assert abs(counts["code"] / 10_000 - 0.75) < 0.02
    # different seed → different sample; absent source → default_rate 0
    s3 = sample_corpus(docs, {"web": 0.25, "code": 0.75}, seed=8)
    assert sorted(r.doc_id for r in s3.select("doc_id").collect()) != a
    assert sample_corpus(docs, {"web": 0.5}).filter(
        F.col("source") == "code").count() == 0


def test_split_corpus_bands(spark):
    from pyg_timeseries_spark.textops.corpus import split_corpus

    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [f"d{i}" for i in range(3000)]})
    df = spark.createDataFrame(pdf)
    out = split_corpus(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 3000          # exhaustive & disjoint
    assert abs(counts["train"] / 3000 - 0.8) < 0.05
    # stability: labels depend only on the doc's own id
    sub = split_corpus(df.limit(100), {"train": 0.8, "val": 0.1, "test": 0.1})
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]
    # reruns identical
    again = {r["doc_id"]: r["split"] for r in
             split_corpus(df, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert again == full


def test_split_corpus_validates_fractions(spark):
    from pyg_timeseries_spark.textops.corpus import split_corpus

    import pandas as pd
    import pytest as _pt

    df = spark.createDataFrame(pd.DataFrame({"doc_id": ["a"]}))
    with _pt.raises(ValueError):
        split_corpus(df, {"train": 0.5, "val": 0.1})


def test_mixture_sample_budget_and_determinism(spark):
    import pandas as pd

    from pyg_timeseries_spark.textops.corpus import mixture_sample

    rows = [(i, f"s{i % 4}", 100) for i in range(400)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "n_tokens"])
    )
    weights = {"s0": 0.4, "s1": 0.3, "s2": 0.2, "s3": 0.1}
    out = mixture_sample(docs, weights, budget_tokens=20_000).persist()
    pdf = out.toPandas()
    # every doc gets a verdict; rates quantized to ppm and capped at 1e6
    assert len(pdf) == 400
    assert (pdf["__rate_ppm"] <= 1_000_000).all()
    # expected kept tokens per source ~ budget*w (rate uncapped here:
    # T_s = 10_000 per source, budget*w <= 8_000)
    rates = pdf.groupby("source")["__rate_ppm"].first()
    for src, w in weights.items():
        assert rates[src] == int(20_000 * w / 10_000 * 1_000_000) or \
            abs(rates[src] - 20_000 * w / 10_000 * 1_000_000) <= 1
    # deterministic: same coins -> identical keep set on re-run
    again = mixture_sample(docs, weights, budget_tokens=20_000).toPandas()
    assert sorted(pdf[pdf.keep]["doc_id"]) == sorted(again[again.keep]["doc_id"])
    out.unpersist()


def test_mixture_sample_caps_underrepresented_source(spark):
    import pandas as pd

    from pyg_timeseries_spark.textops.corpus import mixture_sample

    docs = spark.createDataFrame(
        pd.DataFrame(
            [(0, "big", 1000), (1, "big", 1000), (2, "tiny", 10)],
            columns=["doc_id", "source", "n_tokens"],
        )
    )
    out = mixture_sample(docs, {"big": 0.5, "tiny": 0.5}, budget_tokens=1000)
    pdf = out.toPandas().set_index("doc_id")
    # tiny's fair share (500 tokens) exceeds its total (10): rate caps at 1
    assert pdf.loc[2, "__rate_ppm"] == 1_000_000 and bool(pdf.loc[2, "keep"])


def test_boilerplate_coverage(spark):
    import pandas as pd

    from pyg_timeseries_spark.textops.corpus import boilerplate_coverage

    boiler = "click here to subscribe"
    rows = [(i, f"{boiler} unique{i} words{i} only{i} here{i}") for i in range(6)]
    rows.append((99, "entirely novel text with no repeats at all whatsoever"))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = boilerplate_coverage(docs, shingle_k=3, min_doc_freq=5).toPandas()
    out = out.set_index("doc_id")
    # 'click here to' and 'here to subscribe' appear in 6 docs -> boilerplate
    assert (out.loc[range(6), "n_boiler"] >= 2).all()
    assert out.loc[99, "n_boiler"] == 0 and out.loc[99, "boiler_frac"] == 0.0
    assert ((0 <= out["boiler_frac"]) & (out["boiler_frac"] <= 1)).all()


def test_quality_gate_band_per_source(spark):
    import numpy as np
    import pandas as pd

    from pyg_timeseries_spark.textops.corpus import quality_gate

    rng = np.random.default_rng(11)
    rows = []
    for s, mu in (("a", 100.0), ("b", 10.0)):
        for i in range(200):
            rows.append((f"{s}{i}", s, float(mu + rng.normal(0, mu / 10))))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "score"])
    )
    out = quality_gate(docs, "score", 0.2, 0.9).toPandas()
    assert len(out) == 400
    for s in ("a", "b"):
        grp = out[out.source == s]
        lo = np.quantile(grp["score"], 0.2)
        hi = np.quantile(grp["score"], 0.9)
        np.testing.assert_allclose(grp["__lo"].iloc[0], lo, rtol=1e-12)
        np.testing.assert_allclose(grp["__hi"].iloc[0], hi, rtol=1e-12)
        exp = (grp["score"] >= lo) & (grp["score"] <= hi)
        assert (grp["keep"] == exp).all()
    # the band is per-source: source b's entire range sits far below
    # source a's lower bound, yet b still keeps ~70% of its docs
    kept_b = out[(out.source == "b") & out.keep]
    assert len(kept_b) > 100


def test_quality_gate_no_upper_and_validation(spark):
    import pandas as pd
    import pytest as _pt

    from pyg_timeseries_spark.textops.corpus import quality_gate

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": list(range(10)),
            "source": ["s"] * 10,
            "score": [float(i) for i in range(10)],
        })
    )
    out = quality_gate(docs, "score", 0.5).toPandas()
    assert out["__hi"].isna().all()
    # p50 of 0..9 is 4.5 -> keep = {5..9}, no upper cut
    assert set(out[out.keep]["score"]) == set(map(float, range(5, 10)))
    with _pt.raises(ValueError):
        quality_gate(docs, "score", 0.9, 0.1)
    with _pt.raises(ValueError):
        quality_gate(docs, "score", -0.1)
