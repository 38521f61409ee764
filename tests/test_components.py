"""Connected components: known graphs, isolated nodes, convergence."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.dedup.components import connected_components


def _cc(spark, edges, nodes=None):
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    n = (
        spark.createDataFrame(pd.DataFrame({"id": nodes}))
        if nodes is not None else None
    )
    out = connected_components(e, nodes=n)
    return dict(
        (r["node"], r["component"]) for r in out.collect()
    )


def test_two_components_and_isolated(spark):
    got = _cc(
        spark,
        [(1, 2), (2, 3), (5, 6)],
        nodes=[1, 2, 3, 5, 6, 9],
    )
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}


def test_chain_diameter(spark):
    # a 12-node path exercises multi-round propagation
    edges = [(i, i + 1) for i in range(12)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_max_iter_guard(spark):
    e = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(20)], columns=["id_a", "id_b"])
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(e, max_iter=2)


def test_edge_direction_irrelevant(spark):
    a = _cc(spark, [(3, 1), (2, 3)])
    b = _cc(spark, [(1, 3), (3, 2)])
    assert a == b == {1: 1, 2: 1, 3: 1}
