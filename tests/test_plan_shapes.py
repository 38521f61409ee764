"""Physical-plan regression guards: the efficiency properties PLANS.md
documents must survive refactors — partial aggregation with a single
exchange on the rollup path, broadcast + rank-limit pushdown on ANN, no
cartesian products in the LSH candidate join.
"""

import contextlib
import io

from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_rollup_single_exchange_partial_agg(spark):
    from pyg_timeseries_spark.plans.rollup import rollup_from_raw

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.col("event_type").alias("source"), "ts", F.col("value").alias("n_tok")
    )
    plan = plan_of(rollup_from_raw(ev, "1m", tokens=None))
    assert plan.count("Exchange") == 1, plan
    assert "partial_" in plan, "map-side partial aggregation missing"
    assert "CartesianProduct" not in plan


def test_window_ops_single_exchange(spark):
    from pyg_timeseries_spark.operators.rolling import rolling_mean
    from pyg_timeseries_spark.sources.tables import events_series

    s = events_series(spark, "/root/testdata/sf0.001")
    plan = plan_of(rolling_mean(s, 5))
    # one hash exchange on key for the window; the null branch adds none
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan


def test_ann_broadcast_and_rank_pushdown(spark):
    from pyg_timeseries_spark.similarity.ann import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = plan_of(cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=10))
    assert "BroadcastExchange" in plan, "query side must broadcast"
    assert "WindowGroupLimit" in plan, "top-k rank-limit pushdown missing"


def test_minhash_no_cartesian(spark):
    from pyg_timeseries_spark.dedup.neardup import minhash_candidates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(minhash_candidates(docs, n_hashes=16, bands=8))
    assert "CartesianProduct" not in plan, "band join must be an equi-join"


def test_ewm_single_exchange_to_python(spark):
    from pyg_timeseries_spark.operators.ewm import ewma
    from pyg_timeseries_spark.sources.tables import events_series

    s = events_series(spark, "/root/testdata/sf0.001")
    plan = plan_of(ewma(s, 10))
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
