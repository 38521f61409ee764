"""Dedup family: exact, MinHash+LSH, SimHash, Jaccard, embedding near-dup —
planted-duplicate recovery tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.dedup.exact import dedup_exact, dedup_groups
from pyg_timeseries_spark.dedup import neardup as ND


WORDS = (
    "the quick brown fox jumps over lazy dog a of to in is that it was for "
    "stream data training corpus token sample model spark engine rollup"
).split()


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        text = " ".join(rng.choice(WORDS, size=60))
        rows.append((i, text))
    # planted near-dups: 100→wordswap of 0, 101→copy of 1, 102→perturbed 2
    base = {r[0]: r[1] for r in rows}
    w0 = base[0].split(); w0[5] = "changed"; rows.append((100, " ".join(w0)))
    rows.append((101, base[1]))
    w2 = base[2].split(); w2[10] = "x"; w2[30] = "y"; rows.append((102, " ".join(w2)))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(docs):
    groups = dedup_groups(docs)
    dupg = groups.filter(F.col("cnt") > 1).collect()
    assert len(dupg) == 1 and dupg[0]["keep_id"] == 1  # doc 101 == doc 1
    kept = dedup_exact(docs)
    assert kept.count() == docs.count() - 1
    assert kept.filter(F.col("doc_id") == 101).count() == 0


def test_minhash_finds_planted_pairs(docs):
    cand = ND.minhash_candidates(docs, n_hashes=32, bands=16).toPandas()
    found = {(r.id_a, r.id_b) for r in cand[cand.jaccard > 0.5].itertuples()}
    assert (0, 100) in found
    assert (1, 101) in found
    assert (2, 102) in found
    drop = ND.minhash_dedup(docs, threshold=0.5, n_hashes=32, bands=16).toPandas()
    assert {100, 101, 102} <= set(drop.doc_id)
    # unrelated docs survive
    assert len(set(drop.doc_id) - {100, 101, 102}) <= 3


def test_jaccard_pairs_oracle(docs):
    jp = ND.jaccard_pairs(docs, max_ids=None).toPandas()
    jp = jp.set_index(["id_a", "id_b"])["jaccard"]
    assert jp.loc[(1, 101)] == 1.0
    assert jp.loc[(0, 100)] > 0.7
    # minhash candidate jaccard equals the exact pair jaccard
    cand = ND.minhash_candidates(docs, n_hashes=32, bands=16).toPandas()
    for r in cand.itertuples():
        assert abs(jp.loc[(r.id_a, r.id_b)] - r.jaccard) < 1e-12


def test_simhash_pairs(docs):
    pairs = ND.simhash_pairs(docs, max_hamming=10).toPandas()
    found = {(r.id_a, r.id_b) for r in pairs.itertuples()}
    assert (1, 101) in found  # identical text → hamming 0
    ham = pairs.set_index(["id_a", "id_b"])["hamming"]
    assert ham.loc[(1, 101)] == 0


def test_embedding_neardup(spark):
    rng = np.random.default_rng(4)
    base = rng.normal(0, 1, (40, 16)).astype("float32")
    base[30] = base[0] + rng.normal(0, 0.01, 16).astype("float32")  # planted
    pdf = pd.DataFrame({"vec_id": range(40), "embedding": list(base)})
    df = spark.createDataFrame(pdf)
    out = ND.embedding_neardup(df, threshold=0.98, dim=16).toPandas()
    assert (0, 30) in {(r.id_a, r.id_b) for r in out.itertuples()}
