"""Round-5 surface: chunk-level exact-substring dedup, canonical-doc
election, Holt linear-trend smoothing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.dedup.components import (
    cluster_canonical, connected_components,
)
from pyg_timeseries_spark.dedup.substr import chunk_dedup, doc_chunks
from pyg_timeseries_spark.operators.holt import holt, holt_, holt_kernel


# ---- chunk_dedup ------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_doc_chunks_shapes(spark):
    d = _docs(spark, [(0, "a b c d e f g"), (1, ""), (2, "   "), (3, None),
                      (4, "x y z")])
    got = {(r["id"], r["pos"]): r["chunk"]
           for r in doc_chunks(d, w=3).collect()}
    assert got[(0, 0)] == "a b c"
    assert got[(0, 1)] == "d e f"
    assert got[(0, 2)] == "g"          # trailing partial chunk survives
    assert got[(4, 0)] == "x y z"
    assert not any(k[0] in (1, 2, 3) for k in got)  # degenerate docs: none


def test_chunk_dedup_removes_repeated_spans(spark):
    """Boilerplate chunks dedup only where they land on the same chunk
    alignment (the documented granularity tradeoff of the non-overlapping
    variant): docs 1 and 2 start with the 6-word boiler at pos 0, so doc
    1 keeps the first occurrence and doc 2 — pure boilerplate — empties
    out; doc 0 embeds the same words mid-doc at a different alignment and
    is untouched."""
    boiler = "subscribe to our newsletter for updates"   # 6 words
    d = _docs(spark, [
        (0, f"fresh article content here {boiler}"),
        (1, f"{boiler} another unique piece of writing"),
        (2, boiler),                                      # pure boilerplate
        (3, "wholly original text with no repetition at all"),
    ])
    out = {r["doc_id"]: r for r in chunk_dedup(d, w=6).collect()}
    assert out[1]["text_dedup"].startswith("subscribe")   # first occurrence
    assert out[2]["text_dedup"] == "" and out[2]["n_kept"] == 0
    assert out[0]["n_kept"] == out[0]["n_chunks"]         # misaligned: kept
    assert out[3]["n_kept"] == out[3]["n_chunks"]
    # counts are consistent
    for r in out.values():
        assert 0 <= r["n_kept"] <= r["n_chunks"]


def test_chunk_dedup_first_occurrence_rule(spark):
    """Within one doc a repeated chunk keeps only its FIRST position; the
    election is on (doc_id, pos) lexicographic min."""
    d = _docs(spark, [(5, "p q r p q r"), (6, "p q r")])
    out = {r["doc_id"]: r for r in chunk_dedup(d, w=3).collect()}
    assert out[5]["text_dedup"] == "p q r" and out[5]["n_kept"] == 1
    assert out[6]["n_kept"] == 0


def test_chunk_dedup_matches_python_replay(spark):
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(words, rng.integers(5, 40))))
            for i in range(40)]
    w = 4
    seen, expect = set(), {}
    for doc_id, text in rows:
        ws = text.split()
        kept = []
        n_chunks = (len(ws) + w - 1) // w
        for p in range(n_chunks):
            c = " ".join(ws[p * w:(p + 1) * w])
            if c not in seen:
                seen.add(c)
                kept.append(c)
        expect[doc_id] = (" ".join(kept), n_chunks, len(kept))
    got = {r["doc_id"]: (r["text_dedup"], r["n_chunks"], r["n_kept"])
           for r in chunk_dedup(_docs(spark, rows), w=w).collect()}
    assert got == expect


def test_chunk_dedup_plan_no_window(spark):
    """First-occurrence election must be a partial-combinable min
    aggregate, not a per-chunk-hash row_number window (skew on
    mega-duplicated boilerplate)."""
    d = _docs(spark, [(0, "a b c"), (1, "a b c")])
    plan = chunk_dedup(d, w=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" not in plan and "Window" not in plan.replace(
        "WindowGroupLimit", ""), plan


# ---- cluster_canonical ------------------------------------------------------

def test_cluster_canonical_election(spark):
    edges = spark.createDataFrame(
        pd.DataFrame([(1, 2), (2, 3), (10, 11)], columns=["id_a", "id_b"])
    )
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 10, 11, 20],
        "q": [5.0, 9.0, 9.0, 1.0, None, 7.0],
    }))
    labels = connected_components(edges, nodes=docs.select("doc_id"))
    out = {r["component"]: r for r in
           cluster_canonical(labels, docs, "q").collect()}
    # family {1,2,3}: max q = 9 tie between 2 and 3 → smallest id 2
    assert out[1]["canonical"] == 2 and out[1]["best_quality"] == 9.0
    assert out[1]["n_members"] == 3
    # family {10,11}: null quality ranks worst → 10 wins
    assert out[10]["canonical"] == 10 and out[10]["n_members"] == 2
    # singleton
    assert out[20]["canonical"] == 20 and out[20]["n_members"] == 1


# ---- holt -------------------------------------------------------------------

def _holt_python(xs, alpha, beta, horizon=0.0):
    lvl = trd = None
    out = []
    for x in xs:
        if x is None or (isinstance(x, float) and np.isnan(x)):
            out.append(np.nan)
            continue
        if lvl is None:
            lvl, trd = x, 0.0
        else:
            prev = lvl
            lvl = alpha * x + (1 - alpha) * (lvl + trd)
            trd = beta * (lvl - prev) + (1 - beta) * trd
        out.append(lvl + horizon * trd)
    return out


def _series(spark, vals):
    pdf = pd.DataFrame({
        "key": "k",
        "ts": pd.date_range("2024-01-01", periods=len(vals), freq="1min"),
        "v": vals,
    })
    return spark.createDataFrame(pdf)


def test_holt_matches_reference_loop(spark):
    rng = np.random.default_rng(5)
    vals = list(np.cumsum(rng.normal(0.3, 1.0, 200)))  # trending walk
    vals[7] = np.nan
    vals[100] = np.nan
    df = _series(spark, vals)
    got = (holt(df, 0.3, 0.1).toPandas().sort_values("ts")["holt"]
           .to_numpy(float))
    exp = np.array(_holt_python(vals, 0.3, 0.1))
    np.testing.assert_allclose(got, exp, rtol=0, atol=0, equal_nan=True)
    # forecast horizon
    got2 = (holt(df, 0.3, 0.1, horizon=5).toPandas().sort_values("ts")
            ["holt"].to_numpy(float))
    exp2 = np.array(_holt_python(vals, 0.3, 0.1, horizon=5))
    np.testing.assert_allclose(got2, exp2, rtol=0, atol=0, equal_nan=True)


def test_holt_tracks_linear_trend(spark):
    """On a perfectly linear series the fitted level converges to the
    series and the trend to the slope."""
    vals = [float(3 * i + 10) for i in range(300)]
    df = _series(spark, vals)
    data, state = holt_(df, 0.5, 0.3)
    s = state.collect()[0]["state"]
    assert abs(s[2] - 3.0) < 1e-6          # trend ≈ slope
    last = data.toPandas().sort_values("ts")["holt"].iloc[-1]
    assert abs(last - vals[-1]) < 1e-3


def test_holt_resume_bit_identical(spark):
    """(head, then tail from head's state) == one sweep, bit-for-bit —
    the engine's segmented-execution invariant extends to Holt."""
    rng = np.random.default_rng(9)
    vals = list(np.cumsum(rng.normal(0, 1, 120)))
    full = holt(_series(spark, vals), 0.4, 0.2).toPandas().sort_values("ts")

    head = _series(spark, vals[:50])
    tail_pdf = pd.DataFrame({
        "key": "k",
        "ts": pd.date_range("2024-01-01", periods=120, freq="1min")[50:],
        "v": vals[50:],
    })
    _, st = holt_(head, 0.4, 0.2)
    tail = holt(spark.createDataFrame(tail_pdf), 0.4, 0.2, state_df=st)
    got_tail = tail.toPandas().sort_values("ts")["holt"].to_numpy(float)
    exp_tail = full["holt"].to_numpy(float)[50:]
    assert np.array_equal(got_tail, exp_tail, equal_nan=True)  # bitwise


def test_holt_kernel_validation():
    with pytest.raises(ValueError):
        holt_kernel(np.array([1.0]), 0.0, 0.5)
    with pytest.raises(ValueError):
        holt_kernel(np.array([1.0]), 0.5, 1.5)


# ---- holt_winters -----------------------------------------------------------

from pyg_timeseries_spark.operators.holt import (  # noqa: E402
    holt_winters, holt_winters_, holt_winters_kernel,
)


def _hw_python(xs, alpha, beta, gamma, m):
    seen, lvl, trd = 0, None, None
    sea = [np.nan] * m
    out = []
    for x in xs:
        if x is None or (isinstance(x, float) and np.isnan(x)):
            out.append(np.nan)
            continue
        p = seen % m
        if seen < m:
            sea[p] = x
            out.append(x)
            seen += 1
            if seen == m:
                lvl = sum(sea) / m
                trd = 0.0
                sea = [s - lvl for s in sea]
            continue
        s_old = sea[p]
        new_lvl = alpha * (x - s_old) + (1 - alpha) * (lvl + trd)
        new_trd = beta * (new_lvl - lvl) + (1 - beta) * trd
        sea[p] = gamma * (x - lvl - trd) + (1 - gamma) * s_old
        lvl, trd = new_lvl, new_trd
        out.append(lvl + sea[p])
        seen += 1
    return out


def test_holt_winters_matches_replay(spark):
    rng = np.random.default_rng(7)
    m = 6
    season = 3.0 * np.sin(2 * np.pi * np.arange(m) / m)
    vals = [
        0.05 * i + season[i % m] + rng.normal(0, 0.2) for i in range(160)
    ]
    vals[10] = np.nan
    vals[77] = np.nan
    got = (holt_winters(_series(spark, vals), 0.3, 0.1, 0.2, m)
           .toPandas().sort_values("ts")["holt_winters"].to_numpy(float))
    exp = np.array(_hw_python(vals, 0.3, 0.1, 0.2, m))
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12,
                               equal_nan=True)


def test_holt_winters_tracks_seasonal_series(spark):
    """On a noiseless seasonal+trend series the one-step fit converges."""
    m = 4
    season = [5.0, -2.0, 1.0, -4.0]
    vals = [0.5 * i + season[i % m] for i in range(400)]
    got = (holt_winters(_series(spark, vals), 0.5, 0.2, 0.3, m)
           .toPandas().sort_values("ts")["holt_winters"].to_numpy(float))
    np.testing.assert_allclose(got[-20:], vals[-20:], atol=0.05)


def test_holt_winters_resume_bit_identical(spark):
    rng = np.random.default_rng(15)
    m = 5
    vals = list(np.cumsum(rng.normal(0, 1, 90)))
    full = (holt_winters(_series(spark, vals), 0.4, 0.1, 0.2, m)
            .toPandas().sort_values("ts")["holt_winters"].to_numpy(float))
    for split in (3, m, 40):          # mid-warm-up, at boundary, deep
        _, st = holt_winters_(_series(spark, vals[:split]), 0.4, 0.1, 0.2, m)
        tail_pdf = pd.DataFrame({
            "key": "k",
            "ts": pd.date_range("2024-01-01", periods=90, freq="1min")[split:],
            "v": vals[split:],
        })
        tail = holt_winters(spark.createDataFrame(tail_pdf), 0.4, 0.1, 0.2,
                            m, state_df=st)
        got = tail.toPandas().sort_values("ts")["holt_winters"].to_numpy(float)
        assert np.array_equal(got, full[split:], equal_nan=True), split


def test_holt_winters_short_key_passthrough(spark):
    """A key with fewer than m valid rows never leaves warm-up: output
    equals input."""
    vals = [3.0, 7.0, np.nan]
    got = (holt_winters(_series(spark, vals), 0.3, 0.1, 0.2, 8)
           .toPandas().sort_values("ts")["holt_winters"].tolist())
    assert got[0] == 3.0 and got[1] == 7.0 and np.isnan(got[2])


def test_holt_winters_validation():
    with pytest.raises(ValueError):
        holt_winters_kernel(np.ones(4), 0.3, 0.1, 0.2, 1)
    with pytest.raises(ValueError):
        holt_winters_kernel(np.ones(4), 0.3, 0.1, 1.5, 4)
