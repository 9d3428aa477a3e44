"""Batch≡stream equivalence (SURVEY.md §2.11): the reference defines stream
results as equal to the one-pass batch result over the same file."""

from __future__ import annotations

from big_data_analytics_mini_projects_spark.operators.sampling import (
    sample_entities_hashbucket,
)
from big_data_analytics_mini_projects_spark.sources.tables import load_table
from big_data_analytics_mini_projects_spark.streaming.stream_stats import (
    events_stream,
    run_available_now,
    stream_global_stats,
    stream_hashbucket_sample,
    stream_hourly_counts,
)


def test_stream_global_stats_equals_batch(spark, sf_dir):
    got = run_available_now(stream_global_stats(events_stream(spark, sf_dir))).collect()
    from big_data_analytics_mini_projects_spark.plans.samplingq import (
        welford_global_stats,
    )

    want = welford_global_stats(spark, sf_dir).collect()
    assert len(got) == 1
    assert got[0]["n"] == want[0]["n"]
    assert got[0]["mean"] == want[0]["mean"]
    assert got[0]["std"] == want[0]["std"]


def test_stream_hashbucket_sample_equals_batch(spark, sf_dir):
    stream_rows = run_available_now(
        stream_hashbucket_sample(events_stream(spark, sf_dir)).select(
            "event_id", "user_id", "value"
        ),
        output_mode="append",
    ).collect()
    batch_rows = sample_entities_hashbucket(
        load_table(spark, sf_dir, "events"), "user_id", 1, "0", "hb"
    ).select("event_id", "user_id", "value").collect()
    assert sorted(r["event_id"] for r in stream_rows) == sorted(
        r["event_id"] for r in batch_rows
    )


def test_stream_hourly_equals_batch(spark, sf_dir):
    got = {
        (r["window_start_us"], r["event_type"]): (r["n"], r["sum_value"])
        for r in run_available_now(
            stream_hourly_counts(events_stream(spark, sf_dir))
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    want = {
        (r["ws"], r["event_type"]): (r["n"], r["sum_value"])
        for r in ev.groupBy(
            (F.expr("ts_us div 3600000000") * 3600000000).alias("ws"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert got == want


def test_stateful_user_stats_across_microbatches(spark, sf_dir, tmp_path):
    """applyInPandasWithState must carry per-user state ACROSS micro-batches:
    split events into 3 files, stream with maxFilesPerTrigger=1 (3 batches),
    and check each user's final emission equals the batch aggregate."""
    import uuid

    from pyspark.sql import functions as F

    from big_data_analytics_mini_projects_spark.streaming.stream_stats import (
        stream_user_stats,
    )

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_split")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"mb_{uuid.uuid4().hex[:10]}"
    q = (
        stream_user_stats(sdf)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emissions = spark.table(name)
    assert emissions.count() > ev.select("user_id").distinct().count(), (
        "expected multiple emissions per user across micro-batches"
    )
    # final emission per user = the one with max n (state accumulates)
    final = (
        emissions.groupBy("user_id")
        .agg(F.max(F.struct("n", "total_cents", "mean")).alias("s"))
        .select("user_id", "s.n", "s.total_cents", "s.mean")
    )
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)")).alias("total_cents"),
    )
    got = {r["user_id"]: (r["n"], r["total_cents"]) for r in final.collect()}
    exp = {r["user_id"]: (r["n"], r["total_cents"]) for r in want.collect()}
    assert got == exp


def test_stream_scd2_equals_batch_closed_intervals(spark, sf_dir):
    """The streaming SCD2 operator must emit exactly the batch twin's CLOSED
    intervals (to_us != -1); the open tail run stays in state unemitted."""
    from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES

    got = {
        tuple(r)
        for r in QUERIES["streaming_scd2_intervals"].build(spark, sf_dir).collect()
    }
    batch = {
        tuple(r)
        for r in QUERIES["scd2_user_event_intervals"]
        .build(spark, sf_dir)
        .collect()
        if r["to_us"] != -1
    }
    assert got == batch
