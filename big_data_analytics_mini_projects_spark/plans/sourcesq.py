"""Source/sink coverage queries (SURVEY.md §2.1, §2.5): the CSV and JSON-lines
ingestion paths exercised end-to-end through a materialize -> rescan round trip,
plus the sorted-materialization sink shape.

The reference ingests (a) positional CSV transactions (sampler_v02.py:41-48,
schema "record_id, date, user_id, amount" per Assignment 1 Description.htm:38)
and (b) gzipped JSON-lines reviews (a3_p1.py:12-27). The driver testdata is
parquet, so these queries *derive* a reference-shaped file from the testdata,
write it to a scratch dir, and re-ingest it through the real source operators
(sources/readers.py scan_csv / scan_text_json) — proving the byte-level
ingestion path, schema application, and round-trip fidelity, not just the
parquet fast path. At 100 TB the same scan_csv/scan_text_json calls read a
directory of many files in parallel; writing partitioned output here keeps that
shape honest (no coalesce(1)).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import round_stable, sql_round_stable
from ..operators.aggregates import dsum, sql_dsum
from ..operators.relational import join_broadcast
from ..sources.readers import scan_csv, scan_text_json
from ..sources.tables import load_table
from .registry import register
from .shared import reset_scratch as _reset, scratch_path as _scratch_path




@register(
    "scan_csv_transactions",
    oracle=(
        "SELECT CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS day, "
        "COUNT(*) AS n_tx, COUNT(DISTINCT user_id) AS n_users, "
        f"{sql_dsum('value', 4)} AS total_amount, "
        + sql_round_stable(f"{sql_dsum('value', 4)} / COUNT(*)")
        + " AS avg_amount "
        "FROM events GROUP BY day"
    ),
    doc="Positional-CSV ingestion round trip (scan_csv, sampler_v02.py:41-48): "
    "events -> transactions-shaped CSV (record_id, date, user_id, amount) -> "
    "scan_csv with the declared TRANSACTIONS_SCHEMA -> per-day stats. Doubles "
    "survive the text round trip exactly (shortest-repr encoding) and the "
    "decimal sum makes the aggregate engine-stable.",
    tags=("scan_csv", "sink_collect", "agg_distinct"),
)
def scan_csv_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tx = ev.select(
        F.col("event_id").alias("record_id"),
        F.expr("ts_us div 86400000000").cast("string").alias("date"),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("value").alias("amount"),
    )
    path = _scratch_path("transactions_csv", sf_dir)
    _reset(path)
    tx.write.mode("overwrite").csv(path)
    parsed = scan_csv(spark, path)  # TRANSACTIONS_SCHEMA, positional
    return parsed.groupBy(F.col("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_tx"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("amount", 4).alias("total_amount"),
        round_stable(dsum("amount", 4) / F.count(F.lit(1))).alias("avg_amount"),
    )


@register(
    "scan_text_reviews",
    oracle=(
        "SELECT verified, COUNT(*) AS n_reviews, "
        # Outer CASTs: DuckDB SUM(BIGINT) -> HUGEINT -> float64 in pandas,
        # mismatching Spark's int64 in the driver's dtype-sensitive value-hash.
        "CAST(SUM(CAST(overall AS BIGINT)) AS BIGINT) AS sum_overall, "
        "CAST(SUM(LENGTH(reviewText)) AS BIGINT) AS sum_chars FROM ("
        "  SELECT 1.0 + (doc_id % 5) AS overall, (doc_id % 3) = 0 AS verified, "
        "         text AS reviewText FROM documents) "
        "GROUP BY verified"
    ),
    doc="JSON-lines ingestion round trip (scan_text_json, a3_p1.py:12-27): "
    "documents -> reviews-shaped JSON-lines (overall/verified/reviewerID/asin/"
    "reviewText) -> scan_text_json with REVIEWS_SCHEMA (absent 'verified' -> "
    "false, the a3_p1.py:26-27 assumption) -> stats by verified flag. JSON "
    "string escaping makes the text column byte-exact across the round trip.",
    tags=("scan_text", "project_json"),
)
def scan_text_reviews(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    reviews = docs.select(
        (F.lit(1.0) + (F.col("doc_id") % 5).cast("double")).alias("overall"),
        # Only verified=true rows carry the field; scan_text_json must default
        # the rest to false (the reference's KeyError-fallback semantics).
        F.when((F.col("doc_id") % 3) == 0, F.lit("true")).alias("verified"),
        F.concat(F.lit("u"), F.col("doc_id") % 97).alias("reviewerID"),
        F.concat(F.lit("asin"), F.col("doc_id") % 53).alias("asin"),
        F.col("text").alias("reviewText"),
    )
    path = _scratch_path("reviews_jsonl", sf_dir)
    _reset(path)
    reviews.write.mode("overwrite").option("ignoreNullFields", "true").json(path)
    parsed = scan_text_json(spark, path)
    return parsed.groupBy("verified").agg(
        F.count(F.lit(1)).alias("n_reviews"),
        F.sum(F.col("overall").cast("bigint")).alias("sum_overall"),
        F.sum(F.length("reviewText")).alias("sum_chars"),
    )


def bucketed_tables(spark: SparkSession, sf_dir: str):
    """Materialize orders + customer bucketed by their join key (8 buckets,
    sorted within buckets) and return the catalog-backed DataFrames.

    Bucketing pre-shuffles the data ONCE at write time; every subsequent
    equi-join or aggregation on the bucket key reads co-located partitions
    and skips its exchange entirely — at 100 TB this turns the nightly
    fact-to-dim join from a full-cluster shuffle into a local merge
    (tests/test_plans.py asserts the exchange-free plan). Tables are
    external (scratch path) so reruns are idempotent per sf dir.
    """
    tag = sf_dir.rstrip("/").replace("/", "_").replace(".", "_").lstrip("_")
    spark.sql("CREATE DATABASE IF NOT EXISTS bdamp_bkt")
    specs = [
        ("orders", ["o_orderkey", "o_custkey", "o_totalprice"], "o_custkey"),
        ("customer", ["c_custkey", "c_mktsegment"], "c_custkey"),
    ]
    out = []
    for name, cols, key in specs:
        full = f"bdamp_bkt.{name}_{tag}"
        path = _scratch_path(f"bkt_{name}", sf_dir)
        if not (spark.catalog.tableExists(full) and os.path.isdir(path)):
            spark.sql(f"DROP TABLE IF EXISTS {full}")
            df = load_table(spark, sf_dir, name).select(*cols)
            _reset(path)
            (
                df.write.bucketBy(8, key)
                .sortBy(key)
                .option("path", path)
                .mode("overwrite")
                .saveAsTable(full)
            )
        out.append(spark.table(full))
    return out


@register(
    "bucketed_join_orders",
    oracle=(
        "SELECT c_mktsegment, COUNT(*) AS n_orders, "
        f"{sql_dsum('o_totalprice')} AS total_price "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment"
    ),
    doc="Co-located join on bucketed tables: orders and customer bucketed 8x "
    "on the join key at write time, so the join itself runs exchange-free "
    "(plan-asserted in tests/test_plans.py); results identical to the plain "
    "join oracle. The write-once/join-many layout for recurring fact-dim "
    "joins at scale.",
    tags=("bucketing",),
    bench=False,  # dominated by the one-time bucketed write
)
def bucketed_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_b, cust_b = bucketed_tables(spark, sf_dir)
    joined = orders_b.join(cust_b, orders_b.o_custkey == cust_b.c_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@register(
    "sort_out_nation_stats",
    oracle=(
        "SELECT r_name, n_name, COUNT(c_custkey) AS n_customers, "
        + sql_round_stable("AVG(c_acctbal)")
        + " AS avg_acctbal "
        "FROM nation JOIN region ON n_regionkey = r_regionkey "
        "LEFT JOIN customer ON c_nationkey = n_nationkey "
        "GROUP BY r_name, n_name ORDER BY r_name, n_name"
    ),
    doc="Sorted full materialization (sort_out + sink_collect, "
    "MRSystemSimulator2020.py:153-154,172-173 sorted pprint of every result): "
    "global orderBy before the collect sink; round4 on the float output "
    "(MRSystemSimulator2020.py:245).",
    tags=("sort_out", "sink_collect", "round4", "join_broadcast"),
)
def sort_out_nation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    dims = join_broadcast(nation, region, nation.n_regionkey == region.r_regionkey)
    j = cust.join(
        F.broadcast(dims.select("n_nationkey", "n_name", "r_name")),
        cust.c_nationkey == F.col("n_nationkey"),
        "right",
    )
    return (
        j.groupBy("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            round_stable(F.avg("c_acctbal")).alias("avg_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


def partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events written once as hive-partitioned parquet (partition column =
    event_type), read back through the partition-discovering reader. Cached
    per (session, sf) like the bucketed tables: write-once/read-many."""
    path = _scratch_path("events_by_type", sf_dir)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        _reset(path)
        ev = load_table(spark, sf_dir, "events")
        (
            ev.select("event_id", "ts_us", "user_id", "value", "event_type")
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(path)
        )
    return spark.read.parquet(path)


@register(
    "sink_partitioned_pruned",
    oracle=(
        "SELECT epoch_us(ts) // 3600000000 AS hour_bucket, COUNT(*) AS n, "
        "COUNT(DISTINCT user_id) AS n_users, "
        f"{sql_dsum('value', 4)} AS sum_value "
        "FROM events WHERE event_type = 'purchase' GROUP BY hour_bucket"
    ),
    doc="Partitioned parquet sink + partition-pruned rescan: events written "
    "partitionBy(event_type), then the purchase-only hourly rollup reads "
    "exactly one partition directory — the event_type predicate is resolved "
    "at planning time from directory names (PartitionFilters, plan-asserted "
    "in tests/test_plans.py), so 4/5 of the data is never opened. The "
    "layout-as-index pattern that makes selective scans at 100 TB feasible.",
    tags=("sink_partitioned", "scan_text", "filter_pred"),
    bench=False,  # dominated by the one-time partitioned write
)
def sink_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    pe = partitioned_events(spark, sf_dir)
    return (
        pe.filter(F.col("event_type") == "purchase")
        .groupBy(F.expr("ts_us div 3600000000").alias("hour_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", 4).alias("sum_value"),
        )
    )
