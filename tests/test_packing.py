"""Sequence-packing invariants (textops/packing.py)."""

import pandas as pd
from pyspark.sql import functions as F

from pyg_timeseries_spark.textops.packing import (
    pack_concat, pack_greedy, pack_stats,
)

MAX_LEN = 64


def _docs(spark):
    """Deterministic doc table with token counts spanning the interesting
    regimes: tiny, mid, exactly max_len, and longer than max_len."""
    return spark.range(200).select(
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(2 * MAX_LEN)) + 1).cast("long").alias("n_tok"),
    )


def test_pack_concat_partitions_every_token(spark):
    d = _docs(spark).persist()
    out = pack_concat(d, MAX_LEN).toPandas()
    src = d.toPandas()
    # every token of every doc is covered exactly once, in order
    span = out.groupby("doc_id").agg(lo=("doc_start", "min"))
    out["slice_len"] = out.doc_end - out.doc_start
    tot = out.groupby("doc_id")["slice_len"].sum()
    exp = src.set_index("doc_id")["n_tok"]
    assert (tot == exp.loc[tot.index]).all()
    assert (span.lo == 0).all()
    # sequences are gap-free and exactly MAX_LEN except each key's last
    fill = out.groupby(["source", "seq_id"])["slice_len"].sum().reset_index()
    last = fill.groupby("source")["seq_id"].max().reset_index()
    full = fill.merge(last, on=["source", "seq_id"], how="left", indicator=True)
    non_last = full[full._merge == "left_only"]
    assert (non_last["slice_len"] == MAX_LEN).all()
    # within a sequence the slices tile [0, fill) without overlap
    for (_, _), g in out.groupby(["source", "seq_id"]):
        g = g.sort_values("seq_off")
        ends = (g.seq_off + g.slice_len).to_numpy()
        assert g.seq_off.iloc[0] == 0
        assert (g.seq_off.to_numpy()[1:] == ends[:-1]).all()
    d.unpersist()


def test_pack_greedy_no_split_and_bounded(spark):
    d = _docs(spark).persist()
    out = pack_greedy(d, MAX_LEN).toPandas()
    src = d.toPandas()
    assert len(out) == len(src)  # every doc lands exactly once, whole
    fill = out.groupby(["source", "seq_id"])["n_tok"].sum().reset_index()
    n_docs = out.groupby(["source", "seq_id"])["doc_id"].count().reset_index()
    over = fill.merge(n_docs, on=["source", "seq_id"])
    # a sequence exceeds MAX_LEN only when it is one single long doc
    bad = over[(over.n_tok > MAX_LEN) & (over.doc_id > 1)]
    assert len(bad) == 0
    # greedy invariant: a doc never fits in the PREVIOUS sequence's space
    pdf = out.sort_values(["source", "doc_id"]).reset_index(drop=True)
    for srckey, g in pdf.groupby("source"):
        prev_fill = {}
        for r in g.itertuples(index=False):
            if r.seq_id > 0 and r.seq_pos_off == 0:
                assert prev_fill[r.seq_id - 1] + r.n_tok > MAX_LEN
            prev_fill[r.seq_id] = r.seq_pos_off + r.n_tok
    # offsets are the running fill
    assert (pdf.groupby(["source", "seq_id"]).apply(
        lambda g: (g.seq_pos_off.to_numpy()
                   == g.n_tok.cumsum().shift(fill_value=0).to_numpy()).all(),
        include_groups=False,
    )).all()
    d.unpersist()


def test_pack_stats(spark):
    d = _docs(spark)
    packed = pack_greedy(d, MAX_LEN)
    stats = pack_stats(packed, MAX_LEN).toPandas().set_index("source")
    fill = packed.groupBy("source", "seq_id").agg(
        F.sum("n_tok").alias("f")).toPandas()
    for src, g in fill.groupby("source"):
        assert stats.loc[src, "n_seqs"] == len(g)
        assert abs(stats.loc[src, "mean_fill"] - g.f.mean()) < 1e-9
        assert abs(
            stats.loc[src, "pad_frac"]
            - (1 - g.f.sum() / (len(g) * MAX_LEN))
        ) < 1e-9


def test_pack_concat_plan_is_window_only(spark):
    """Scale shape: pack_concat must stay a window + generator plan — no
    applyInPandas, no join, no cartesian."""
    import io
    import contextlib

    d = _docs(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pack_concat(d, MAX_LEN).explain("formatted")
    plan = buf.getvalue()
    assert "Window" in plan and "Generate" in plan
    for bad in ("ArrowEvalPython", "FlatMapGroupsInPandas", "CartesianProduct",
                "SortMergeJoin", "BroadcastHashJoin"):
        assert bad not in plan, bad
