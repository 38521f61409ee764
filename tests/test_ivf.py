"""IVF ANN: probe-all == brute force exactly; recall improves with probes;
assignment is deterministic, map-only, and integer-exact."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.similarity.ann import cosine_topk
from pyg_timeseries_spark.similarity.ivf import (
    assign_clusters, ivf_topk, seed_centroids,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").persist()


def _pairs(df):
    return set(map(tuple, df.select("query_id", "neighbor_id", "rank").toPandas()
                   .itertuples(index=False)))


def test_probe_all_equals_brute_force(spark, emb):
    q = emb.filter(F.col("vec_id") < 5)
    exact = _pairs(cosine_topk(emb, q, k=10))
    full_probe = _pairs(ivf_topk(emb, q, dim=64, k=10, n_clusters=8, n_probe=8))
    assert full_probe == exact
    # …and stays exact after Lloyd refinement (lists change, coverage doesn't)
    refined = _pairs(ivf_topk(emb, q, dim=64, k=10, n_clusters=8, n_probe=8,
                              kmeans_iters=2))
    assert refined == exact


def test_recall_monotone_in_probes(spark, emb):
    q = emb.filter(F.col("vec_id") < 20)
    exact = _pairs(cosine_topk(emb, q, k=10))
    recalls = []
    for p in (1, 4, 8):
        got = _pairs(ivf_topk(emb, q, dim=64, k=10, n_clusters=8, n_probe=p))
        hit = len({(a, b) for a, b, _ in got} & {(a, b) for a, b, _ in exact})
        recalls.append(hit / len(exact))
    assert recalls[-1] == 1.0
    assert recalls[0] <= recalls[1] <= recalls[2]
    assert recalls[1] > 0.3  # probing half the lists finds a useful share


def test_assignment_deterministic_and_map_only(spark, emb):
    import contextlib
    import io

    cents = seed_centroids(emb, 8)
    assert len(cents) == 8 and len(cents[0]) == 64
    a1 = assign_clusters(emb, cents).select("vec_id", "cluster").toPandas()
    a2 = assign_clusters(emb.repartition(7), cents).select(
        "vec_id", "cluster").toPandas()
    m = a1.merge(a2, on="vec_id", suffixes=("", "_b"))
    assert (m["cluster"] == m["cluster_b"]).all()
    # map-only: no exchange in the assignment plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assign_clusters(emb, cents).explain()
    assert "Exchange" not in buf.getvalue()
    # every cluster id valid
    assert a1["cluster"].between(0, 7).all()
