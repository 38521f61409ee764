"""Sessionization: lag+cumsum assignment vs a Python reference, equivalence
with Spark's native merging session windows (incl. the diff == gap boundary,
which MERGES), and the streaming rendition on finalized windows."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators.sessions import (
    session_stats,
    session_window_counts,
    sessionize,
    stream_session_counts,
)

GAP = 1800.0


def _events(n=4000, n_keys=25, seed=17):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for k in range(n_keys):
        t = base
        for _ in range(n // n_keys):
            # mix of short gaps, exact-boundary gaps, and session breaks
            step = rng.choice([30, 300, 1800, 1801, 7200], p=[0.4, 0.3, 0.1, 0.1, 0.1])
            t = t + pd.Timedelta(seconds=int(step))
            rows.append((f"u{k}", t))
    return pd.DataFrame(rows, columns=["user_id", "ts"])


def _ref_sessions(pdf, gap=GAP):
    out = {}
    for k, grp in pdf.groupby("user_id"):
        ts = sorted(grp["ts"])
        sid, sids = 1, []
        for i, t in enumerate(ts):
            if i and (t - ts[i - 1]).total_seconds() > gap:
                sid += 1
            sids.append(sid)
        out[k] = list(zip(ts, sids))
    return out


def test_sessionize_matches_reference(spark):
    pdf = _events()
    got = (
        sessionize(spark.createDataFrame(pdf), gap_s=GAP)
        .select("user_id", "ts", "session_id")
        .toPandas()
    )
    ref = _ref_sessions(pdf)
    for k, grp in got.groupby("user_id"):
        grp = grp.sort_values("ts")
        assert list(zip(grp["ts"], grp["session_id"])) == ref[k], k


def test_exact_gap_boundary_merges(spark):
    """diff == gap stays in the SAME session — pinned to Spark's native
    session_window behavior (adjacent windows merge)."""
    pdf = pd.DataFrame(
        {
            "user_id": ["a"] * 3,
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:30:00", "2024-01-01 01:00:01"]
            ),
        }
    )
    got = (
        sessionize(spark.createDataFrame(pdf), gap_s=GAP)
        .select("session_id")
        .toPandas()["session_id"]
        .tolist()
    )
    assert got == [1, 1, 2]  # 1800s gap merges; 1801s breaks


def test_session_window_equivalence(spark):
    """Native session_window partitions each key's timeline identically:
    same starts, same counts, end == last_event + gap."""
    pdf = _events(n=2000, n_keys=10)
    df = spark.createDataFrame(pdf)
    stats = session_stats(df, gap_s=GAP).toPandas()
    native = session_window_counts(df, gap="30 minutes").toPandas()
    key_s = stats.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    key_n = native.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(key_s) == len(key_n)
    assert (key_s["user_id"] == key_n["user_id"]).all()
    assert (key_s["session_start"] == key_n["session_start"]).all()
    assert (key_s["n_events"] == key_n["n_events"]).all()
    assert (
        key_n["session_end"] - key_s["session_end"] == pd.Timedelta(seconds=1800)
    ).all()


def test_stream_sessions_match_batch(spark, tmp_path):
    """availableNow streaming with a watermark emits exactly the finalized
    sessions the batch rendition computes (a far-future sentinel per key
    pushes the watermark past all real sessions)."""
    pdf = _events(n=1000, n_keys=5)
    sentinel = pd.DataFrame(
        {
            "user_id": sorted(pdf["user_id"].unique()),
            "ts": pd.Timestamp("2025-01-01"),
        }
    )
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(pd.concat([pdf, sentinel])).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_session_counts(stream, gap="30 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.sql("select * from sess_out")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    exp = (
        session_window_counts(spark.createDataFrame(pdf), gap="30 minutes")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert got[["user_id", "session_start", "session_end", "n_events"]].equals(
        exp[["user_id", "session_start", "session_end", "n_events"]]
    )


def test_sessionize_single_window_operator(spark):
    """lag + running sum share one Window spec — the plan has exactly one
    Window operator and one key-partitioned Exchange."""
    pdf = _events(n=200, n_keys=4)
    df = sessionize(spark.createDataFrame(pdf), gap_s=GAP)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") - plan.count("WindowGroupLimit") >= 1
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gap_stats_matches_pandas(spark):
    from pyg_timeseries_spark.operators.sessions import gap_stats

    pdf = _events(n=600, n_keys=4)
    pdf = pdf.rename(columns={"user_id": "key"})
    got = {
        r["key"]: r.asDict()
        for r in gap_stats(
            spark.createDataFrame(pdf), key="key", ts="ts", expected_s=300.0
        ).collect()
    }
    for k, grp in pdf.groupby("key"):
        gaps = grp.sort_values("ts")["ts"].diff().dropna().dt.total_seconds()
        g = got[k]
        assert g["n_gaps"] == len(gaps)
        assert abs(g["mean_gap_s"] - gaps.mean()) < 1e-6
        assert g["min_gap_s"] == gaps.min()
        assert g["max_gap_s"] == gaps.max()
        assert abs(g["on_cadence_frac"] - (gaps <= 450).mean()) < 1e-12
