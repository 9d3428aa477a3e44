"""Property tests for the deterministic sketches (operators/sketches.py):
HLL estimates track true cardinality; Count-Min never under-counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_mini_projects_spark.operators.sketches import (
    cm_estimate,
    cm_sketch_counts,
    histogram_quantiles,
    hll_distinct,
)


def test_hll_tracks_cardinality(spark):
    """Seeded ids at several true cardinalities: estimate within ~3x the
    theoretical standard error (1.04/sqrt(512) ~ 4.6%)."""
    for n in (50, 500, 5000):
        ids = spark.range(n).select(F.concat(F.lit("user"), F.col("id")).alias("v"))
        est = hll_distinct(ids, "v", p=9).collect()[0]["n_est"]
        assert abs(est - n) / n < 0.15, (n, est)


def test_hll_grouped(spark):
    df = spark.range(300).select(
        (F.col("id") % 3).alias("g"),
        F.concat(F.lit("u"), F.col("id")).alias("v"),
    )
    got = {r["g"]: r["n_est"] for r in hll_distinct(df, "v", ["g"], p=9).collect()}
    for g, est in got.items():
        assert abs(est - 100) / 100 < 0.2, (g, est)


def test_cm_never_undercounts(spark):
    """CM point estimates upper-bound true counts (one-sided error)."""
    rows = [(f"w{i % 7}",) for i in range(700)] + [("rare",)]
    items = spark.createDataFrame(rows, "item string")
    sketch = cm_sketch_counts(items, "item")
    true = items.groupBy("item").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = {
        r["item"]: (r["true_cnt"], r["cm_est"])
        for r in cm_estimate(sketch, true).collect()
    }
    for item, (t, e) in est.items():
        assert e >= t, (item, t, e)
    # the hot items dominate: their estimates should be exact or near-exact
    assert est["w0"][1] - est["w0"][0] <= 2


def test_cm_point_query_unseen_item(spark):
    """General point queries: an item the sketch never saw must still return
    a row, with cm_est = 0 when any of its depth buckets is empty (left join
    + coalesce — an inner join would drop the seed rows or the item)."""
    items = spark.createDataFrame([("only",)] * 5, "item string")
    sketch = cm_sketch_counts(items, "item")
    probes = spark.createDataFrame([("only",), ("never-seen",)], "item string")
    got = {r["item"]: r["cm_est"] for r in cm_estimate(sketch, probes).collect()}
    assert got["only"] >= 5
    assert "never-seen" in got, "unseen candidate must not vanish from output"
    # with a single distinct sketched item, an unseen item collides with at
    # most a few of the 4 buckets — at least one empty bucket forces 0
    assert got["never-seen"] == 0


def test_histogram_quantiles_bounds_true_quantile(spark):
    """q(p) upper-bounds the true quantile by at most one bin width, and
    never under-estimates it."""
    vals = [(float(i % 1000),) for i in range(5000)]  # uniform 0..999
    df = spark.createDataFrame(vals, "v double")
    got = {
        r["p"]: r["est"]
        for r in histogram_quantiles(
            df, "v", [0.5, 0.9, 0.99], 0.0, 1024.0, 256
        ).collect()
    }
    width = 1024.0 / 256
    s = sorted(v for (v,) in vals)
    import math

    for p, est in got.items():
        true_q = s[math.ceil(p * len(s)) - 1]
        assert true_q <= est <= true_q + width + 1e-9, (p, true_q, est)
