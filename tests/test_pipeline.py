"""End-to-end engine: incremental ingest + resumable EWM over the 1m tier +
Gorilla compression + lineage — incremental == full, bit-for-bit."""

import numpy as np
from pyspark.sql import functions as F

from pyg_timeseries_spark.datagen import sequences
from pyg_timeseries_spark.operators.ewm import ewma_
from pyg_timeseries_spark.plans.pipeline import TimeseriesEngine


def test_engine_end_to_end_incremental(spark, tmp_path):
    raw = sequences(spark, 20_000, with_tokens=False).persist()
    cut = F.lit("2024-01-01 01:30:00").cast("timestamp")
    head = raw.filter(F.col("ts") < cut)
    tail = raw.filter(F.col("ts") >= cut)

    # full run
    full_eng = TimeseriesEngine(spark, str(tmp_path / "full"))
    full_eng.ingest(raw, tokens=None)
    full_out = full_eng.apply(ewma_, "1m", "ewma10", n=10).toPandas()

    # incremental run: head, operator pass, then tail, operator pass
    inc_eng = TimeseriesEngine(spark, str(tmp_path / "inc"))
    inc_eng.ingest(head, tokens=None)
    first = inc_eng.apply(ewma_, "1m", "ewma10", n=10).toPandas()
    inc_eng.ingest(tail, tokens=None)
    second = inc_eng.apply(ewma_, "1m", "ewma10", n=10).toPandas()

    # align: full rows per key == first+second rows per key
    fullp = full_out.sort_values(["key", "ts"]).reset_index(drop=True)
    inc = (
        np.concatenate([
            np.concatenate([
                first[first.key == k].sort_values("ts")["ewma"].to_numpy(),
                second[second.key == k].sort_values("ts")["ewma"].to_numpy(),
            ])
            for k in sorted(fullp.key.unique())
        ])
    )
    assert np.array_equal(fullp["ewma"].to_numpy(), inc, equal_nan=True), (
        "incremental operator pass != full pass"
    )

    # compression round-trip on the tier
    chunks = inc_eng.compress_tier("1m")
    assert chunks.count() > 0
    rep = chunks.select((F.sum(F.length("blob")) / F.sum("n_points")).alias("bpp")).first()
    assert rep["bpp"] < 16.0

    # lineage recorded both batches
    lin = inc_eng.lineage().toPandas()
    assert set(lin.batch_id) == {1, 2}
