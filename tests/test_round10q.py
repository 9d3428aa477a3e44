"""Semantics-level unit tests for the round-7-extension round10q forward
batch (round-8 window): value-band cohorts, Heaps growth, cap sweep, MAD
outliers, ANN recall accounting, and the Lloyd convergence curve."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.plans.round10q import (
    CAP_SWEEP,
    IVF_K,
    LLOYD_ITERS,
    mad_outliers_core,
    retention_bands_core,
)


def test_retention_bands_golden(spark):
    """Two users, hand-computed bands and offsets: user 1 spends 950 cents
    in cohort week 10 (band = 3 digits) and returns in week 12; user 2
    spends 12345 cents in week 11 (band = 5 digits), never returns."""
    e = spark.createDataFrame(
        [
            (1, 10, 900),
            (1, 10, 50),
            (1, 12, 700),
            (2, 11, 12345),
        ],
        "user_id long, week long, cents long",
    )
    rows = {
        (r["cohort_week"], r["band"], r["week_offset"]): (r["n_users"], r["n_events"])
        for r in retention_bands_core(e).collect()
    }
    assert rows == {
        (10, 3, 0): (1, 2),
        (10, 3, 2): (1, 1),
        (11, 5, 0): (1, 1),
    }


def test_retention_bands_monotone(spark, sf_dir):
    """Retention at any offset never exceeds the cohort-band's offset-0
    population (every user has events in their cohort week by definition)."""
    out = QUERIES["retention_value_bands"].build(spark, sf_dir).collect()
    base = {
        (r["cohort_week"], r["band"]): r["n_users"]
        for r in out
        if r["week_offset"] == 0
    }
    for r in out:
        assert r["week_offset"] >= 0
        assert r["n_users"] <= base[(r["cohort_week"], r["band"])]


def test_mad_outliers_golden(spark):
    """5 values with one gross outlier: median 10, MAD 1 (|diffs| =
    [1, 1, 0, 1, 990] -> median 1), fence 5 -> exactly one outlier."""
    c = spark.createDataFrame(
        [("a", 9), ("a", 10), ("a", 10), ("a", 11), ("a", 1000)],
        "event_type string, cents long",
    )
    r = mad_outliers_core(c).collect()[0]
    assert (r["n"], r["med_cents"], r["mad_cents"], r["n_outliers"]) == (
        5,
        10.0,
        1.0,
        1,
    )
    assert r["outlier_rate"] == 0.2


def test_percentile_matches_duckdb_quantile_cont(spark, duck):
    """The cross-engine exactness pin the MAD query rests on: Spark's
    percentile() and DuckDB's quantile_cont() interpolate identically on
    integers, including the even-count .5 midpoint and .25 quarter points."""
    vals = [3, 1, 4, 1, 5, 9, 2, 6]          # even count -> .5 midpoint
    for subset in (vals, vals[:5], [7], [2, 4]):
        sdf = spark.createDataFrame([(v,) for v in subset], "x long")
        for p in (0.25, 0.5, 0.75):
            got = sdf.agg(F.percentile("x", p)).collect()[0][0]
            lits = ", ".join(f"({v})" for v in subset)
            want = duck.execute(
                f"SELECT quantile_cont(x, {p}) FROM (VALUES {lits}) t(x)"
            ).fetchone()[0]
            assert got == want, (subset, p, got, want)


def test_vocab_growth_monotone_and_totals(spark, sf_dir):
    out = sorted(
        QUERIES["vocab_growth_curve"].build(spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    for a, b in zip(out, out[1:]):
        assert b["cum_tokens"] > a["cum_tokens"]
        assert b["cum_types"] >= a["cum_types"]
    from big_data_analytics_mini_projects_spark.functions.text import tokenize_ws
    from big_data_analytics_mini_projects_spark.sources.tables import load_table

    tok = tokenize_ws(load_table(spark, sf_dir, "documents"))
    total = tok.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("word").alias("d")
    ).collect()[0]
    assert out[-1]["cum_tokens"] == total["n"]
    assert out[-1]["cum_types"] == total["d"]


def test_domain_cap_sweep_monotone(spark, sf_dir):
    out = {r["cap"]: r for r in QUERIES["domain_cap_sweep"].build(spark, sf_dir).collect()}
    assert set(out) == set(CAP_SWEEP)
    prev_docs, prev_toks = 0, 0
    for cap in CAP_SWEEP:
        r = out[cap]
        assert prev_docs <= r["kept_docs"] <= r["total_docs"]
        assert prev_toks <= r["kept_tokens"] <= r["total_tokens"]
        prev_docs, prev_toks = r["kept_docs"], r["kept_tokens"]


def test_ann_recall_bounds_and_blocked_dominance(spark, sf_dir):
    """Recall is n_hits/K in [0,1]; and the nprobe=3 IVF candidate set is a
    superset of the probe-1 (own-cell) blocked search's, so per-query it
    can only find MORE of the truth than blocked top-k restricted to K."""
    out = QUERIES["ann_recall_ivf"].build(spark, sf_dir).collect()
    assert len(out) == 5
    for r in out:
        assert 0 <= r["n_hits"] <= IVF_K
        assert r["recall"] == round(r["n_hits"] / IVF_K, 6)


def _replay_hourly(spark, tmp_path, files, delay="2 hours"):
    """Replay mtime-ordered parquet files through the watermarked hourly
    window aggregate and return (emitted rows, recentProgress)."""
    import glob
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    stream_dir = str(tmp_path / f"stream_{uuid.uuid4().hex[:8]}")
    os.makedirs(stream_dir)
    for i, rows in enumerate(files):
        df = spark.createDataFrame(rows, "event_id long, ts_us long")
        part = str(tmp_path / f"part_{uuid.uuid4().hex[:8]}")
        df.coalesce(1).write.mode("overwrite").parquet(part)
        dst = os.path.join(stream_dir, f"{i}.parquet")
        shutil.copy(glob.glob(part + "/part-*.parquet")[0], dst)
        os.utime(dst, (1000.0 * (i + 1), 1000.0 * (i + 1)))
    sch = spark.read.parquet(stream_dir).schema
    sdf = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(stream_dir)
        .withColumn("ts", F.timestamp_micros("ts_us"))
    )
    agg = (
        sdf.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.collect_list("event_id").alias("ids"))
        .select(F.unix_micros("w.start").alias("ws"), "ids")
    )
    name = f"late_pin_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        r["ws"]: sorted(r["ids"]) for r in spark.table(name).collect()
    }
    return rows, q.recentProgress


HOUR = 3_600_000_000
MIN = 60_000_000


def test_late_filter_lags_one_batch_and_uses_window_end(spark, tmp_path):
    """The two boundary pins streaming_late_data_drop's oracle rests on:

    (a) the late FILTER of batch N uses the watermark from batches 0..N-2 —
        batch-1 rows are never dropped, and batch-2's fence comes from
        batch 0's max (10h -> wm 8h), NOT batch 1's (11h -> 9h);
    (b) the drop predicate is WINDOW-END based, non-strict: a row at
        8h+1us (event time below an 8.5h watermark) survives because its
        window [8h,9h) ends above it, while the [7h,8h) window's row
        (end == fence in the aligned probe) is dropped."""
    # distinct per-batch maxima: A max 10h, B max 11h
    a = [(0, 0), (1, 10 * HOUR)]
    b = [(100, 11 * HOUR)]
    c = [(200, 8 * HOUR + 1), (201, 7 * HOUR + 1)]
    rows, progress = _replay_hourly(spark, tmp_path, [a, b, c])
    dropped = [
        s["numRowsDroppedByWatermark"]
        for p in progress
        for s in p["stateOperators"]
    ]
    # only batch 2 drops, and only the end<=8h row (fence from batch 0 max)
    assert sum(dropped) == 1
    # final watermark 11h-2h=9h: [8h,9h) end 9h <= 9h emits (non-strict),
    # with the batch-2 survivor aggregated
    assert rows[8 * HOUR] == [200]
    assert rows[0] == [0]
    assert 7 * HOUR not in rows  # its only row was dropped
    assert 10 * HOUR not in rows  # end 11h > wm 9h: buffered, never emitted

    # window-end pin at a NON-aligned watermark (A max 10h30m -> wm 8h30m):
    # row at 8h15m is below the watermark but its window end (9h) is above
    a2 = [(0, 0), (1, 10 * HOUR + 30 * MIN)]
    b2 = [(100, 1)]
    c2 = [(200, 8 * HOUR + 15 * MIN), (201, 7 * HOUR + 59 * MIN)]
    rows2, progress2 = _replay_hourly(spark, tmp_path, [a2, b2, c2])
    dropped2 = [
        s["numRowsDroppedByWatermark"]
        for p in progress2
        for s in p["stateOperators"]
    ]
    assert sum(dropped2) == 1          # only the end-8h row
    assert 8 * HOUR not in rows2       # survivor buffered (end 9h > 8.5h)
    assert rows2[0] == [0, 100]


def test_late_drop_long_watermark_twin(spark, tmp_path):
    """The latency/completeness trade: with a watermark longer than the
    data span nothing is ever late — and nothing is ever FINAL either, so
    append mode emits zero windows (state is all open)."""
    a = [(0, 0), (1, 10 * HOUR)]
    c = [(200, 1), (201, 5 * HOUR)]
    rows, progress = _replay_hourly(
        spark, tmp_path, [a, [(100, 2)], c], delay="720 hours"
    )
    assert rows == {}
    assert all(
        s["numRowsDroppedByWatermark"] == 0
        for p in progress
        for s in p["stateOperators"]
    )


def test_lloyd_curve_monotone_inertia(spark, sf_dir):
    """The Lloyd guarantee: inertia never increases across iterations (the
    assignment step only ever moves a point to a closer centroid, and the
    re-mean step minimizes within-cell SSE)."""
    out = sorted(
        QUERIES["lloyd_convergence_curve"].build(spark, sf_dir).collect(),
        key=lambda r: r["iteration"],
    )
    assert [r["iteration"] for r in out] == list(range(LLOYD_ITERS))
    for a, b in zip(out, out[1:]):
        assert b["inertia"] <= a["inertia"] + 1e-6, (a, b)
    for r in out:
        assert 1 <= r["n_cells"] <= 10
        assert r["n_moved"] >= 0
