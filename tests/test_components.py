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
    # driver_uf_edges=0 forces the iterative propagation tier (the driver
    # union-find tier has no round limit to trip)
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(e, max_iter=2, driver_uf_edges=0)


def test_edge_direction_irrelevant(spark):
    a = _cc(spark, [(3, 1), (2, 3)])
    b = _cc(spark, [(1, 3), (3, 2)])
    assert a == b == {1: 1, 2: 1, 3: 1}


def test_execution_tiers_identical(spark):
    """The three size tiers (driver union-find / broadcast rounds /
    shuffle rounds) must produce the identical min-label components."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    nodes = list(range(70))
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    n = spark.createDataFrame(pd.DataFrame({"id": nodes}))

    def run(**kw):
        out = connected_components(e, nodes=n, **kw)
        return dict((r["node"], r["component"]) for r in out.collect())

    uf = run()  # 80 edges -> driver union-find tier
    bcast = run(driver_uf_edges=0)  # broadcast-propagation tier
    shuffle = run(driver_uf_edges=0, broadcast_rows=0)  # shuffle tier
    assert uf == bcast == shuffle
    assert len(uf) == 70
