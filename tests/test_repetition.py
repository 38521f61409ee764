"""Gopher-style repetition stats (textops/analysis.py repetition_stats):
per-row expression-only rendition vs a literal Python reference, plus the
plan-shape guarantee that the whole thing is a shuffle-free map."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.textops.analysis import repetition_stats


def _ref(text, ns=(2, 3, 4)):
    lines = text.split("\n")
    c = Counter(lines)
    dup_n = sum(v - 1 for v in c.values())
    dup_ch = sum((v - 1) * len(k) for k, v in c.items())
    line_chars = sum(len(ln) for ln in lines)
    out = {
        "dup_line_frac": dup_n / len(lines) if lines else 0.0,
        "dup_line_char_frac": dup_ch / line_chars if line_chars else 0.0,
    }
    w = re.split(r"\s+", text.lower().strip())
    n_chars = len(text)
    for n in ns:
        grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
        if grams and n_chars:
            cnt = Counter(grams)
            best = min(cnt, key=lambda g: (-cnt[g], g))
            out[f"top{n}_char_frac"] = cnt[best] * len(best) / n_chars
        else:
            out[f"top{n}_char_frac"] = 0.0
    return out


COLS = [
    "dup_line_frac",
    "dup_line_char_frac",
    "top2_char_frac",
    "top3_char_frac",
    "top4_char_frac",
]


def _run(spark, texts):
    pdf = pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(texts))], "text": texts})
    got = (
        repetition_stats(spark.createDataFrame(pdf))
        .select("doc_id", *COLS)
        .collect()
    )
    return {r["doc_id"]: {c: r[c] for c in COLS} for r in got}


def test_handcrafted(spark):
    texts = [
        "spam spam spam spam eggs",                       # heavy 2-gram "spam spam"
        "a b c\na b c\na b c\nunique line",                # 2 duplicate line occurrences
        "one line only no repeats here at all",
        "x\nx\nx\nx",                                     # all-dup lines
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        exp = _ref(t)
        for c in COLS:
            assert got[f"d{i}"][c] == pytest.approx(exp[c], abs=1e-12), (i, c)
    # sanity on the semantics themselves
    assert got["d1"]["dup_line_frac"] == pytest.approx(2 / 4)
    assert got["d3"]["dup_line_frac"] == pytest.approx(3 / 4)
    assert got["d0"]["top2_char_frac"] > 0.5


def test_random_docs_match_reference(spark):
    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "x"]
    texts = []
    for _ in range(40):
        n_lines = rng.integers(1, 6)
        lines = [
            " ".join(rng.choice(vocab, size=rng.integers(1, 12)))
            for _ in range(n_lines)
        ]
        # force some duplicate lines
        if n_lines > 2 and rng.random() < 0.5:
            lines[1] = lines[0]
        texts.append("\n".join(lines))
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        exp = _ref(t)
        for c in COLS:
            assert got[f"d{i}"][c] == pytest.approx(exp[c], abs=1e-12), (i, c, t)


def test_empty_and_degenerate(spark):
    got = _run(spark, ["", "word", "\n\n"])
    assert got["d0"]["top2_char_frac"] == 0.0
    assert got["d1"]["dup_line_frac"] == 0.0
    assert got["d1"]["top2_char_frac"] == 0.0  # one word -> no 2-grams
    # "\n\n" -> three empty lines: all-duplicate occurrences, zero chars
    assert got["d2"]["dup_line_frac"] == pytest.approx(2 / 3)
    assert got["d2"]["dup_line_char_frac"] == 0.0


def test_plan_is_shuffle_free(spark):
    pdf = pd.DataFrame({"doc_id": ["a"], "text": ["x y z"]})
    df = repetition_stats(spark.createDataFrame(pdf))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
