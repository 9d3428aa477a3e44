"""Semantics-level unit tests for the round-7-continuation round11q forward
batch (round-8 window): watermark sensitivity, the events x documents
quality bridge, the SRP probe-count recall curve, LSH recall/precision
accounting, and the quality-threshold sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.plans.round11q import (
    PROBE_SWEEP,
    QT_SWEEP,
    RQ_BANDS,
    SENS_DELAYS,
    SRP_QUERIES,
    SRP_K,
    bucket_quality_bands,
)


def test_bucket_quality_bands_golden(spark):
    """5 buckets, 4 bands: rank slices by explicit integer arithmetic —
    band = ((rank-1) * 4) div 5 over ranks 1..5 -> [0, 0, 1, 2, 3]."""
    stats = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)],
        "bucket long, sum_tok long",
    )
    got = {
        r["bucket"]: r["band"] for r in bucket_quality_bands(stats, 4).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3}


def test_bucket_quality_bands_order_not_value(spark):
    """Banding is rank-based: scaling every token mass by 1000 must not
    change any band assignment."""
    rows = [(b, (b * 37) % 11 + 1) for b in range(16)]
    s1 = spark.createDataFrame(rows, "bucket long, sum_tok long")
    s2 = spark.createDataFrame(
        [(b, t * 1000) for b, t in rows], "bucket long, sum_tok long"
    )
    a = {r["bucket"]: r["band"] for r in bucket_quality_bands(s1).collect()}
    b = {r["bucket"]: r["band"] for r in bucket_quality_bands(s2).collect()}
    assert a == b
    assert set(a.values()) == set(range(RQ_BANDS))


def test_retention_bridge_monotone(spark, sf_dir):
    """Retention at any offset never exceeds the cohort-band's offset-0
    population, and bands stay in range."""
    out = QUERIES["retention_quality_bridge"].build(spark, sf_dir).collect()
    base = {
        (r["cohort_week"], r["band"]): r["n_users"]
        for r in out
        if r["week_offset"] == 0
    }
    for r in out:
        assert 0 <= r["band"] < RQ_BANDS
        assert r["week_offset"] >= 0
        assert r["n_users"] <= base[(r["cohort_week"], r["band"])]


def test_srp_curve_monotone(spark, sf_dir):
    """All sweep rows present; candidates and hits non-decreasing in the
    probe count (supersets under a total order cannot lose truth members);
    recall consistent with hits / (|Q| * k)."""
    rows = {
        r["n_probes"]: r
        for r in QUERIES["srp_recall_probe_curve"].build(spark, sf_dir).collect()
    }
    assert sorted(rows) == sorted(PROBE_SWEEP)
    prev_c, prev_h = -1, -1
    for p in sorted(rows):
        r = rows[p]
        assert r["n_candidates"] >= prev_c
        assert r["n_hits"] >= prev_h
        assert 0.0 <= r["recall"] <= 1.0
        assert abs(r["recall"] - r["n_hits"] / (SRP_QUERIES * SRP_K)) < 1e-6
        prev_c, prev_h = r["n_candidates"], r["n_hits"]


def test_lsh_recall_invariants(spark, sf_dir):
    """Verified pairs are a subset of candidates; hits bounded by both truth
    and pair counts; ratios in [0, 1]; the slice actually holds truth."""
    rows = {
        r["stage"]: r
        for r in QUERIES["lsh_recall_precision"].build(spark, sf_dir).collect()
    }
    assert set(rows) == {"candidates", "verified"}
    c, v = rows["candidates"], rows["verified"]
    assert c["n_truth"] == v["n_truth"] > 0
    assert v["n_pairs"] <= c["n_pairs"]
    assert v["n_hits"] <= c["n_hits"]
    for r in (c, v):
        assert r["n_hits"] <= min(r["n_truth"], r["n_pairs"])
        if r["recall"] is not None:
            assert 0.0 <= r["recall"] <= 1.0
        if r["precision"] is not None:
            assert 0.0 <= r["precision"] <= 1.0


def test_quality_sweep_consistency(spark, sf_dir):
    """Kept counts are non-increasing in the threshold, and the 0.0 point
    agrees exactly with quality_classifier_score's keep=true count (same
    features, weights, and IEEE parenthesization)."""
    out = sorted(
        QUERIES["quality_threshold_sweep"].build(spark, sf_dir).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in out] == sorted(QT_SWEEP)
    for a, b in zip(out, out[1:]):
        assert b["kept_docs"] <= a["kept_docs"]
        assert b["kept_tokens"] <= a["kept_tokens"]
        assert a["total_docs"] == b["total_docs"]
    qcs = QUERIES["quality_classifier_score"].build(spark, sf_dir)
    n_keep = qcs.filter(F.col("keep")).count()
    at_zero = next(r for r in out if r["threshold"] == 0.0)
    assert at_zero["kept_docs"] == n_keep


def test_watermark_sensitivity_matches_late_drop(spark, sf_dir):
    """The 2-hour rows must equal streaming_late_data_drop's per-type
    aggregate — the sensitivity query is that pinned accounting run
    side-by-side with a faster setting."""
    sens = QUERIES["watermark_sensitivity_hourly"].build(spark, sf_dir)
    long_ms = dict(SENS_DELAYS)["2 hours"]
    got = {
        r["event_type"]: (r["n_windows"], r["n_events"], r["sum_value"])
        for r in sens.filter(F.col("delay_ms") == long_ms).collect()
    }
    ld = QUERIES["streaming_late_data_drop"].build(spark, sf_dir)
    want = {
        r["event_type"]: (r["n_windows"], r["n_events"], r["sum_value"])
        for r in ld.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("n").alias("n_events"),
            F.sum(F.col("sum_value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert got == want
