"""Rollup cascade + incremental checkpoint invariants (north_rule core):
tier-from-parent == tier-from-raw, and ingest(head)+ingest(tail) ==
ingest(full), bit-for-bit including token arrays.
"""

import pytest
from pyspark.sql import functions as F

from pyg_timeseries_spark.datagen import sequences
from pyg_timeseries_spark.plans.checkpoint import RollupStore
from pyg_timeseries_spark.plans.rollup import (
    bucket_col, rollup_all_tiers, rollup_cascade, rollup_from_raw,
)

N_ROWS = 30_000  # ~8 hours of 1s data on the hot source


@pytest.fixture(scope="module")
def raw(spark):
    return sequences(spark, N_ROWS).persist()


def rows_of(df):
    """Canonical sorted row list with token arrays as tuples (exact compare)."""
    pdf = df.toPandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    if "tokens" in pdf.columns:
        pdf["tokens"] = pdf["tokens"].apply(lambda a: tuple(a) if a is not None else None)
    return list(map(tuple, pdf.itertuples(index=False)))


def test_cascade_equals_direct(raw):
    m1 = rollup_from_raw(raw, "1m")
    for tier in ("1h", "1d"):
        direct = rollup_from_raw(raw, tier)
        via = m1
        for t in (("1h",) if tier == "1h" else ("1h", "1d")):
            via = rollup_cascade(via, t)
        assert rows_of(direct) == rows_of(via), f"cascade mismatch at {tier}"


def test_counts_conserved(raw):
    tiers = rollup_all_tiers(raw)
    n_raw = raw.count()
    tok_raw = raw.select(F.sum("n_tok")).collect()[0][0]
    for tier, df in tiers.items():
        agg = df.select(F.sum("cnt"), F.sum("sum_n_tok"), F.sum(F.size("tokens"))).collect()[0]
        assert agg[0] == n_raw, tier
        assert agg[1] == tok_raw, tier
        assert agg[2] == tok_raw, f"token payload lost at {tier}"


def test_incremental_equals_full(spark, raw, tmp_path):
    cut = F.lit("2024-01-01 03:00:00").cast("timestamp")
    head = raw.filter(F.col("ts") < cut)
    tail = raw.filter(F.col("ts") >= cut)

    full_store = RollupStore(str(tmp_path / "full"), spark)
    full_tiers = full_store.ingest(raw)

    inc_store = RollupStore(str(tmp_path / "inc"), spark)
    inc_store.ingest(head)
    inc_tiers = inc_store.ingest(tail)

    for tier in ("1m", "1h", "1d"):
        assert rows_of(full_tiers[tier]) == rows_of(inc_tiers[tier]), (
            f"incremental != full at tier {tier}"
        )

    # the DEFAULT ingest mode is chunked: bounded token part-rows in
    # tokens_1m, measures-only tiers (no unbounded array column)
    assert inc_store.read_table("tokens_1m") is not None
    for tier in ("1m", "1h", "1d"):
        assert "tokens" not in inc_tiers[tier].columns, tier

    # lineage was recorded for both batches
    lin = inc_store.lineage().toPandas()
    assert set(lin.batch_id) == {1, 2}
    assert (lin.rows > 0).all()


def test_ingest_is_o_delta(spark, tmp_path):
    """The scale claim made executable: merging a batch reads only the
    day-partitions the delta touches — never the full rollup history."""
    import io
    import contextlib

    raw = sequences(spark, 20_000, interval_s=60).persist()  # ~7-14 days/source
    cut = F.lit("2024-01-05 12:00:00").cast("timestamp")  # mid-day → day 05 overlaps
    head, tail = raw.filter(F.col("ts") < cut), raw.filter(F.col("ts") >= cut)

    store = RollupStore(str(tmp_path / "odelta"), spark)
    store.ingest(head)
    hist_1m = store.read_table("rollup_1m").persist()
    total_hist = hist_1m.count()

    store.ingest(tail, with_scan_stats=True)
    stats = store.last_ingest_stats
    touched = set(stats["touched_parts"])
    # the tail batch spans a strict subset of the store's days
    all_days = {
        r[0] for r in hist_1m.select(F.to_date("bucket").cast("string")).distinct().collect()
    }
    assert touched - all_days, "tail must add new days"
    overlap_days = touched & all_days
    hist_in_touched = hist_1m.filter(
        F.to_date("bucket").cast("string").isin(list(touched))
    ).count()
    assert overlap_days, "fixture must overlap at least one existing day"
    # O(delta): the merge scanned exactly the touched partitions' rows…
    assert stats["prev_rows_scanned_1m"] == hist_in_touched
    # …which is a strict subset of history
    assert stats["prev_rows_scanned_1m"] < total_hist

    # and the pruned read pushes the partition filter into the scan
    pruned = store.read_table("rollup_1m", parts=sorted(touched))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "p_day" in plan

    # manifest: untouched days still point at commit 1, touched days at 2
    man = store.meta["tables"]["rollup_1m"]["manifests"]["2"]
    assert {man[d] for d in (all_days - touched)} == {1}
    assert {man[d] for d in touched} == {2}

    # incremental result equals a from-scratch ingest (tokens included)
    full = RollupStore(str(tmp_path / "odelta_full"), spark).ingest(raw)
    for tier in ("1m", "1h", "1d"):
        assert rows_of(store.read_table(f"rollup_{tier}")) == rows_of(full[tier]), tier
    hist_1m.unpersist()
    raw.unpersist()


def test_time_travel_versions(spark, raw, tmp_path):
    cut = F.lit("2024-01-01 03:00:00").cast("timestamp")
    store = RollupStore(str(tmp_path / "tt"), spark)
    store.ingest(raw.filter(F.col("ts") < cut))
    v1_rows = rows_of(store.read_table("rollup_1m"))
    store.ingest(raw.filter(F.col("ts") >= cut))
    assert rows_of(store.read_table("rollup_1m", version=1)) == v1_rows
    assert len(rows_of(store.read_table("rollup_1m"))) > len(v1_rows)


def test_exact_rebuild_guarded_without_retained_raw(spark, raw, tmp_path):
    """exact_rebuild on a store whose earlier batches did not retain raw must
    refuse the rebuild instead of silently undercounting overlap cells."""
    cut = F.lit("2024-01-01 03:00:30").cast("timestamp")  # mid-bucket cut
    store = RollupStore(str(tmp_path / "guard"), spark)
    store.ingest(raw.filter(F.col("ts") < cut), exact_rebuild=False)
    with pytest.raises(ValueError, match="exact_rebuild"):
        store.ingest(raw.filter(F.col("ts") >= cut), exact_rebuild=True)


def test_chunked_tokens_incremental_equals_full(spark, raw, tmp_path):
    """Chunked token mode: ingest(head)+ingest(tail) == ingest(full) on the
    BOUNDED chunk table, and the read-time flatten equals the array-mode 1d
    token payload exactly."""
    cut = F.lit("2024-01-01 03:00:30").cast("timestamp")  # mid-bucket cut
    cap = 512

    full = RollupStore(str(tmp_path / "cf"), spark)
    full.ingest(raw, token_mode="chunked", chunk_cap=cap)
    inc = RollupStore(str(tmp_path / "ci"), spark)
    inc.ingest(raw.filter(F.col("ts") < cut), token_mode="chunked", chunk_cap=cap)
    inc.ingest(raw.filter(F.col("ts") >= cut), token_mode="chunked", chunk_cap=cap)

    def chunk_rows(store):
        pdf = store.read_table("tokens_1m").toPandas().sort_values(
            ["source", "bucket", "part"]).reset_index(drop=True)
        pdf["tokens"] = pdf["tokens"].apply(tuple)
        return list(map(tuple, pdf.itertuples(index=False)))

    assert chunk_rows(inc) == chunk_rows(full)
    # every stored row is bounded
    mx = inc.read_table("tokens_1m").select(F.max(F.size("tokens"))).first()[0]
    assert mx <= cap
    # measures-only tiers have no token column
    assert "tokens" not in inc.read_table("rollup_1d").columns

    # flatten-at-read == the array-mode cascade's 1d payload
    arr = RollupStore(str(tmp_path / "ca"), spark)
    arr.ingest(raw, token_mode="array")
    exp = arr.read_table("rollup_1d").select("source", "bucket", "tokens")
    got = inc.read_tokens("1d")
    assert rows_of(got) == rows_of(exp)


def test_chunked_tokens_hot_bucket_bounded(spark, tmp_path):
    """A single hot (source, day) with 10M+ tokens: the stored representation
    stays ≤ cap tokens/row (the array-mode 1d row would be one 10M-element
    array — the executor-OOM shape at real scale)."""
    import pandas as pd  # noqa: F401

    n_docs, toks_per_doc = 2_500, 4_096  # 10.24M tokens, one source, one day
    df = spark.range(n_docs).select(
        F.lit("hot").alias("source"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2024-03-01 00:00:00"))
            + (F.col("id") % 1200) * 60 + F.floor(F.col("id") / 1200)
        ).alias("ts"),
        F.lit(toks_per_doc).cast("int").alias("n_tok"),
        F.transform(
            F.sequence(F.lit(0), F.lit(toks_per_doc - 1)),
            lambda i: F.pmod(F.xxhash64(F.col("id"), i), F.lit(50257)).cast("int"),
        ).alias("tokens"),
    )
    store = RollupStore(str(tmp_path / "hot"), spark)
    store.ingest(df, token_mode="chunked")
    chunks = store.read_table("tokens_1m")
    stats = chunks.select(
        F.sum(F.size("tokens")).alias("total"),
        F.max(F.size("tokens")).alias("mx"),
        F.count(F.lit(1)).alias("rows"),
    ).first()
    assert stats["total"] == n_docs * toks_per_doc
    from pyg_timeseries_spark.plans.rollup import MAX_TOKENS_PER_ROW

    assert stats["mx"] <= MAX_TOKENS_PER_ROW
    # day-level read view reassembles the full payload count
    day = store.read_tokens("1d").select(F.sum(F.size("tokens"))).first()[0]
    assert day == n_docs * toks_per_doc


def test_chunked_exact_rebuild_out_of_order(spark, raw, tmp_path):
    """Interleaved late arrival + chunked tokens: exact_rebuild re-chunks
    overlap buckets from retained raw — equals the one-shot ingest."""
    odd = raw.filter(F.col("seq") % 2 == 1)
    even = raw.filter(F.col("seq") % 2 == 0)
    inc = RollupStore(str(tmp_path / "oc"), spark)
    inc.ingest(odd, token_mode="chunked", exact_rebuild=True, chunk_cap=256)
    inc.ingest(even, token_mode="chunked", exact_rebuild=True, chunk_cap=256)
    full = RollupStore(str(tmp_path / "of"), spark)
    full.ingest(raw, token_mode="chunked", exact_rebuild=True, chunk_cap=256)
    assert rows_of(inc.read_tokens("1m")) == rows_of(full.read_tokens("1m"))
    for tier in ("1m", "1h", "1d"):
        assert rows_of(inc.read_table(f"rollup_{tier}")) == rows_of(
            full.read_table(f"rollup_{tier}")), tier


def test_lineage_per_stage(spark, raw, tmp_path):
    """Every ingest stage (raw + each tier commit) emits per-partition row
    counts (north-rule lineage)."""
    store = RollupStore(str(tmp_path / "lin"), spark)
    store.ingest(raw)
    lin = store.lineage().toPandas()
    assert set(lin.stage) == {"raw", "commit_1m", "commit_1h", "commit_1d"}
    assert (lin.rows > 0).all()


def test_expire_snapshots_manifest_gc(spark, raw, tmp_path):
    """expire_snapshots keeps every commit a live manifest references and
    removes the rest; the current view is unaffected."""
    import os

    cut = F.lit("2024-01-01 03:00:00").cast("timestamp")
    store = RollupStore(str(tmp_path / "gc"), spark)
    store.ingest(raw.filter(F.col("ts") < cut))
    store.ingest(raw.filter(F.col("ts") >= cut))
    # both batches touch the single fixture day → the live manifest (v2)
    # references only commit 2; v1's dir is garbage after keep=1
    before = rows_of(store.read_table("rollup_1m"))
    store.expire_snapshots(keep=1)
    base = os.path.join(store.path, "rollup_1m")
    live_dirs = sorted(os.listdir(base))
    assert live_dirs == ["v2"]
    assert rows_of(store.read_table("rollup_1m")) == before


def test_retention_expiry(spark, raw, tmp_path):
    """TTL keeps the newest keep_buckets bucket-intervals from the tier max;
    on single-day data the cutoff bisects the (one) boundary partition."""
    store = RollupStore(str(tmp_path / "ttl"), spark)
    store.ingest(raw)
    before = store.read_table("rollup_1m").count()
    store.expire("1m", keep_buckets=10)
    after = store.read_table("rollup_1m")
    per_src = after.groupBy("source").count().toPandas()
    assert (per_src["count"] <= 10).all()
    assert after.count() < before
    assert store.last_expire_stats["rewritten_parts"] == ["2024-01-01"]


def test_expire_is_metadata_only(spark, tmp_path):
    """The scale claim for retention made executable: expiring history drops
    whole day-partitions from the manifest WITHOUT reading or rewriting them
    (their manifest entries still point at the ORIGINAL commit version), and
    rewrites at most the one boundary day the cutoff bisects."""
    import datetime as dt

    raw = sequences(spark, 20_000, interval_s=60).persist()  # ~7 days on web
    store = RollupStore(str(tmp_path / "meta_ttl"), spark)
    store.ingest(raw, with_lineage=False)
    full = store.read_table("rollup_1m").persist()
    max_b = full.select(F.max("bucket")).first()[0]
    all_days = sorted(
        r[0] for r in full.select(F.to_date("bucket").cast("string")).distinct().collect()
    )
    assert len(all_days) >= 5, "fixture must span multiple days"

    keep = 2 * 1440 + 30  # 2 days + 30 min back from max → mid-day cutoff
    store.expire("1m", keep_buckets=keep)
    stats = store.last_expire_stats
    # ≤1 partition rewritten; everything older dropped metadata-only
    assert len(stats["rewritten_parts"]) == 1
    boundary = stats["rewritten_parts"][0]
    assert stats["dropped_parts"] == [d for d in all_days if d < boundary]
    # surviving untouched days still point at their ORIGINAL commit (v1):
    # proof no survivor was scanned or rewritten
    man = store._manifest("rollup_1m")
    untouched = set(man) - {boundary}
    assert untouched and all(man[d] == 1 for d in untouched)
    # the view equals a plain bucket filter of the pre-expire table
    cutoff = max_b - dt.timedelta(seconds=(keep - 1) * 60)
    expect = full.filter(F.col("bucket") >= F.lit(cutoff))
    assert rows_of(store.read_table("rollup_1m")) == rows_of(expect)
    full.unpersist()
    raw.unpersist()


def test_expire_empty_boundary_drops_not_commits(spark, tmp_path):
    """A cutoff that lands inside a day none of whose rows survive (data
    gap: old day + much newer day) must DROP the boundary day, not commit
    an empty partition — an empty parquet dir in the manifest would fail
    schema inference on every subsequent read."""
    import pandas as pd

    rows = []
    for h, d in ((0, "2024-01-01"), (12, "2024-01-03")):
        for m in range(30):
            rows.append(("web", f"{d} {h:02d}:{m:02d}:00", 1))
    pdf = pd.DataFrame(rows, columns=["source", "ts", "n_tok"]).assign(
        ts=lambda x: pd.to_datetime(x.ts)
    )
    raw2 = spark.createDataFrame(pdf).withColumn(
        "tokens", F.array(F.lit(1).cast("int"))
    )
    store = RollupStore(str(tmp_path / "gap"), spark)
    store.ingest(raw2, with_lineage=False)
    # keep ~2.2 days back from max (2024-01-03 12:29) → cutoff lands inside
    # 2024-01-01 but AFTER that day's last row (00:29)
    store.expire("1m", keep_buckets=2 * 1440 + 700)
    stats = store.last_expire_stats
    assert stats["rewritten_parts"] == []
    assert stats["dropped_parts"] == ["2024-01-01"]
    # the store stays fully readable and holds exactly the newer day
    left = store.read_table("rollup_1m")
    assert left.count() == 30
    assert left.select(F.min("bucket")).first()[0].day == 3


def test_ingest_scan_stats_opt_in(spark, raw, tmp_path):
    """The prev_rows_scanned diagnostics are extra count actions over the
    pruned prev scans — opt-in, so a production batch spends its jobs on
    the commits, not bookkeeping.  Asserted by job count: the same merge
    batch runs strictly fewer Spark jobs without scan stats."""
    cut = F.lit("2024-01-01 03:00:00").cast("timestamp")
    head, tail = raw.filter(F.col("ts") < cut), raw.filter(F.col("ts") >= cut)
    sc = spark.sparkContext

    def jobs_of(label, store_dir, **kw):
        store = RollupStore(str(tmp_path / store_dir), spark)
        store.ingest(head, with_lineage=False)
        sc.setJobGroup(label, label)
        store.ingest(tail, with_lineage=False, **kw)
        n = len(sc.statusTracker().getJobIdsForGroup(label))
        sc.setJobGroup(None, None)
        return n, store

    n_default, store = jobs_of("nostats", "js_off")
    assert not any(k.startswith("prev_rows_scanned")
                   for k in store.last_ingest_stats)
    n_stats, store2 = jobs_of("stats", "js_on", with_scan_stats=True)
    assert "prev_rows_scanned_1m" in store2.last_ingest_stats
    assert n_default < n_stats


def test_ingest_empty_batch_noop(spark, raw, tmp_path):
    store = RollupStore(str(tmp_path / "emptyb"), spark)
    store.ingest(raw)
    before = rows_of(store.read_table("rollup_1m"))
    out = store.ingest(raw.filter(F.lit(False)))
    assert rows_of(store.read_table("rollup_1m")) == before
    assert rows_of(out["1m"]) == before
    # and on a fresh store an empty first batch yields empty tiers
    fresh = RollupStore(str(tmp_path / "emptyf"), spark)
    out2 = fresh.ingest(raw.filter(F.lit(False)))
    assert out2["1m"] is None


# -- sketch measures on the cascade ------------------------------------------


def sketch_rows(df):
    pdf = (
        df.select("source", "bucket", "kmv", "sample")
        .toPandas()
        .sort_values(["source", "bucket"])
        .reset_index(drop=True)
    )
    pdf["kmv"] = pdf["kmv"].apply(tuple)
    pdf["sample"] = pdf["sample"].apply(
        lambda a: tuple((e["h"], e["v"]) for e in a)
    )
    return list(map(tuple, pdf.itertuples(index=False)))


def test_sketch_cascade_equals_direct(raw):
    """KMV + bottom-k sample columns cascade exactly: merging fine-tier
    sketches == sketching raw at the coarse tier, element for element."""
    m1 = rollup_from_raw(raw, "1m", sketch_id="doc_id")
    via = m1
    for tier in ("1h", "1d"):
        via = rollup_cascade(via, tier)
        direct = rollup_from_raw(raw, tier, sketch_id="doc_id")
        assert sketch_rows(direct) == sketch_rows(via), tier


def test_sketch_incremental_equals_full(spark, raw, tmp_path):
    """The store's ingest invariant extends to sketch columns bit-for-bit."""
    cut = F.lit("2024-01-01 03:00:00").cast("timestamp")
    full_store = RollupStore(str(tmp_path / "skf"), spark)
    full_tiers = full_store.ingest(raw, sketch_id="doc_id")
    inc_store = RollupStore(str(tmp_path / "ski"), spark)
    inc_store.ingest(raw.filter(F.col("ts") < cut), sketch_id="doc_id")
    inc_tiers = inc_store.ingest(raw.filter(F.col("ts") >= cut),
                                 sketch_id="doc_id")
    for tier in ("1m", "1h", "1d"):
        assert sketch_rows(full_tiers[tier]) == sketch_rows(inc_tiers[tier]), tier


def test_sketch_estimates_sane(spark, raw):
    """1d-tier estimates recover the true distinct-doc count (exact when
    under k) and a median inside the value range."""
    from pyg_timeseries_spark.functions.sketches import (
        bottomk_quantile, kmv_estimate,
    )
    from pyg_timeseries_spark.plans.rollup import SKETCH_K

    d1 = rollup_from_raw(raw, "1d", sketch_id="doc_id")
    got = d1.select(
        "source", "cnt",
        kmv_estimate(F.col("kmv"), SKETCH_K).alias("est"),
        bottomk_quantile(F.col("sample"), 0.5).alias("q50"),
        "min_n_tok", "max_n_tok",
    ).collect()
    assert got
    for r in got:
        # every doc_id is distinct in the fixture → distinct == cnt
        if r["cnt"] < SKETCH_K:
            assert r["est"] == float(r["cnt"])
        else:
            assert abs(r["est"] - r["cnt"]) / r["cnt"] < 1.5  # k=32 is coarse
        assert r["min_n_tok"] <= r["q50"] <= r["max_n_tok"]


# -- compaction ---------------------------------------------------------------


def test_compact_small_files(spark, raw, tmp_path):
    """Three same-day ingests fragment the day's partitions; compact()
    rewrites ONLY fragmented partitions to one file each, rows identical,
    untouched partitions keep their original commit version."""
    store = RollupStore(str(tmp_path / "cmp"), spark)
    thirds = [
        raw.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i)
        for i in range(3)
    ]
    # a wide write leaves one file per (task, partition); disable AQE's
    # small-data coalescing so this test fragments like a wide cluster
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        # hash split violates the in-bucket append order for token concat,
        # so ingest measures-only (sketches on) — compaction is file layout
        for t in thirds:
            store.ingest(t, tokens=None, sketch_id="doc_id")
    finally:
        spark.conf.set(coalesce_key, old)

    def full_rows(df):
        return (rows_of(df.drop("kmv", "sample")), sketch_rows(df))

    before = full_rows(store.read_table("rollup_1m"))
    frag = store.fragmentation("rollup_1m")
    assert frag, "no partitions?"
    assert max(frag.values()) > 1, "fixture failed to fragment"

    man_before = dict(store._manifest("rollup_1m"))
    stats = store.compact("rollup_1m", max_files=1)
    assert stats["compacted_parts"], "nothing compacted"
    # all compacted partitions now one file
    after = store.fragmentation("rollup_1m")
    for p in stats["compacted_parts"]:
        assert after[p] == 1, (p, after[p])
    # pure motion: identical rows (incl. the sketch columns)
    assert full_rows(store.read_table("rollup_1m")) == before
    # untouched partitions keep their original version
    man_after = store._manifest("rollup_1m")
    for p, v in man_before.items():
        if p not in stats["compacted_parts"]:
            assert man_after[p] == v, p
    # idempotent: second compact is a no-op
    stats2 = store.compact("rollup_1m", max_files=1)
    assert stats2["compacted_parts"] == []


def test_compact_preserves_time_travel(spark, raw, tmp_path):
    store = RollupStore(str(tmp_path / "cmp_tt"), spark)
    cut = F.lit("2024-01-01 03:00:00").cast("timestamp")
    store.ingest(raw.filter(F.col("ts") < cut), tokens=None)
    store.ingest(raw.filter(F.col("ts") >= cut), tokens=None)
    v2 = store.meta["tables"]["rollup_1m"]["version"]
    v2_rows = rows_of(store.read_table("rollup_1m", version=v2))
    store.compact("rollup_1m", max_files=0)  # force full rewrite
    assert rows_of(store.read_table("rollup_1m", version=v2)) == v2_rows
    assert rows_of(store.read_table("rollup_1m")) == v2_rows


def test_four_way_incremental_equals_full(spark, raw, tmp_path):
    """ingest(q1);...;ingest(q4) == ingest(full) — the resume invariant
    holds under chained multi-batch ingestion, tokens and sketches
    included (time-ordered splits keep the append contract)."""
    cuts = ["2024-01-01 02:00:00", "2024-01-01 04:00:00", "2024-01-01 06:00:00"]
    ts = [F.lit(c).cast("timestamp") for c in cuts]
    quarters = [
        raw.filter(F.col("ts") < ts[0]),
        raw.filter((F.col("ts") >= ts[0]) & (F.col("ts") < ts[1])),
        raw.filter((F.col("ts") >= ts[1]) & (F.col("ts") < ts[2])),
        raw.filter(F.col("ts") >= ts[2]),
    ]
    full = RollupStore(str(tmp_path / "q_full"), spark)
    full_tiers = full.ingest(raw, sketch_id="doc_id")
    inc = RollupStore(str(tmp_path / "q_inc"), spark)
    for q in quarters:
        inc_tiers = inc.ingest(q, sketch_id="doc_id")
    for tier in ("1m", "1h", "1d"):
        a, b = full_tiers[tier], inc_tiers[tier]
        assert rows_of(a.drop("kmv", "sample")) == rows_of(b.drop("kmv", "sample")), tier
        assert sketch_rows(a) == sketch_rows(b), tier
    # chunked token payload too
    def chunk_rows(store):
        pdf = store.read_table("tokens_1m").toPandas().sort_values(
            ["source", "bucket", "part"]).reset_index(drop=True)
        pdf["tokens"] = pdf["tokens"].apply(tuple)
        return list(map(tuple, pdf.itertuples(index=False)))

    assert chunk_rows(inc) == chunk_rows(full)


def test_grouping_sets_equals_cascade(spark, raw):
    """One-shot GROUPING SETS tiers == the cascade's tiers measure-for-
    measure (cnt/sum/min/max on the value column)."""
    from pyg_timeseries_spark.plans.rollup import rollup_grouping_sets

    src = raw.select("source", "ts", F.col("n_tok").cast("double").alias("v"))
    gs = rollup_grouping_sets(src, key="source").persist()
    for tier in ("1m", "1h", "1d"):
        direct = (
            src.groupBy(
                "source", bucket_col("ts", tier, src).alias("bucket")
            ).agg(
                F.count("v").alias("cnt"), F.sum("v").alias("sum_v"),
                F.min("v").alias("min_v"), F.max("v").alias("max_v"),
            )
        )
        got = gs.filter(F.col("tier") == tier).drop("tier").withColumnRenamed(
            "key", "source"
        )
        assert got.exceptAll(direct).count() == 0
        assert direct.exceptAll(got).count() == 0
    gs.unpersist()


def test_grouping_sets_single_exchange(spark, raw):
    """The one-shot plan must be Expand -> one partial+final aggregate with
    a single Exchange (no per-tier jobs)."""
    import contextlib
    import io

    from pyg_timeseries_spark.plans.rollup import rollup_grouping_sets

    src = raw.select("source", "ts", F.col("n_tok").cast("double").alias("v"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rollup_grouping_sets(src, key="source").explain()
    plan = buf.getvalue()
    assert "Expand" in plan
    assert plan.count("Exchange") == 1


def test_sketch_join_null_keys(spark, raw):
    """Cells with NULL source or NULL bucket (null ts) are real group-by
    groups; the sketch re-attach join must be null-safe so they carry
    sketches like any other cell (round-5 ADVICE: a plain equi-join
    silently NULLed their kmv/sample)."""
    few = raw.limit(200)
    nulled = few.withColumn(
        "source",
        F.when(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0, F.lit(None)).otherwise(F.col("source")),
    ).withColumn(
        "ts",
        F.when(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 0, F.lit(None)).otherwise(F.col("ts")),
    )
    out = rollup_from_raw(nulled, "1h", sketch_id="doc_id")
    null_cells = out.filter(
        F.col("source").isNull() | F.col("bucket").isNull()
    ).collect()
    assert null_cells  # the fixture produces such cells
    for r in null_cells:
        assert r["kmv"] is not None and len(r["kmv"]) > 0, r
        assert r["sample"] is not None and len(r["sample"]) > 0, r
