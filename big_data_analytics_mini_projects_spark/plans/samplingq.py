"""Sampler / streaming-stats queries over `events` (SURVEY.md §2.6, §2.11).

`events` plays the transactions CSV of Assignment 1 (FIXTURES.md §B):
user_id = sampling entity, value = amount. Mean/σ are computed from exact
decimal sufficient statistics (Σx, Σx² as decimals) so Spark and DuckDB agree
bit-for-bit — same merge-order argument as the reference's combiner legality
(commutative+associative, Assignment 1 Description.htm:38).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import round_stable, sql_round_stable
from ..functions.hashing import hex_bucket, hex_bucket_sql
from ..operators.aggregates import dsum, sql_dsum
from ..operators.sampling import sample_entities_hashbucket
from ..sources.tables import load_table
from .registry import register


def _stats_agg(df: DataFrame) -> DataFrame:
    """(n, n_users, mean, std_pop) of `value` via exact decimal Σx / Σx²."""
    n = F.count(F.lit(1))
    s1 = dsum("value")
    s2 = dsum(F.col("value") * F.col("value"), 4)
    mean = s1 / n
    return df.agg(
        n.alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        round_stable(mean).alias("mean"),
        round_stable(F.sqrt(s2 / n - mean * mean)).alias("std"),
    )


_SQL_STATS = (
    "COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users, "
    + sql_round_stable(f"{sql_dsum('value')} / COUNT(*)")
    + " AS mean, "
    + sql_round_stable(
        f"sqrt({sql_dsum('value * value', 4)} / COUNT(*) - "
        f"({sql_dsum('value')} / COUNT(*)) * ({sql_dsum('value')} / COUNT(*)))"
    )
    + " AS std"
)


@register(
    "agg_distinct_users",
    oracle=(
        "SELECT COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events, "
        "COUNT(DISTINCT event_type) AS n_types FROM events"
    ),
    doc="Distinct-entity pass of the two-pass sampler (agg_distinct, "
    "sampler_v02.py:40-42).",
    tags=("agg_distinct",),
)
def agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "welford_global_stats",
    oracle=f"SELECT {_SQL_STATS} FROM events",
    doc="Global (n, mean, σ_pop) over the full stream — the reference's "
    "Welford accumulator (agg_welford, sampler_v02.py:50-56,81-87); Spark "
    "merges the same sufficient statistics tree-wise. Streaming flavor: "
    "streaming/stream_stats.py (batch≡stream test in tests/).",
    tags=("agg_welford", "agg_mean_std"),
)
def welford_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stats_agg(load_table(spark, sf_dir, "events"))


@register(
    "sample_hashbucket_stats",
    oracle=(
        f"SELECT {_SQL_STATS} FROM events "
        f"WHERE {hex_bucket_sql('user_id', 1, 'hb')} = '0'"
    ),
    doc="One-pass hash-bucket entity sampler + stats (sample_hashbucket, "
    "sampler_v02.py:63-87): stateless entity-complete filter, ~1/16 of users.",
    tags=("sample_hashbucket", "hash_mod", "agg_welford"),
)
def sample_hashbucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return _stats_agg(sample_entities_hashbucket(ev, "user_id", 1, "0", "hb"))


@register(
    "sample_twopass_stats",
    oracle=(
        "WITH u AS (SELECT DISTINCT user_id FROM events), "
        "k AS (SELECT CAST(ceil(0.02 * COUNT(*)) AS BIGINT) AS c FROM u), "
        "s AS (SELECT user_id FROM (SELECT user_id, row_number() OVER "
        "(ORDER BY md5('tp:' || CAST(user_id AS VARCHAR)), user_id) AS rn FROM u) "
        "WHERE rn <= (SELECT c FROM k)) "
        f"SELECT {_SQL_STATS} FROM events WHERE user_id IN (SELECT user_id FROM s)"
    ),
    doc="Two-pass entity sampler + stats (sample_twopass, sampler_v02.py:32-56): "
    "'shuffle then top pct%' realized as seeded-hash order, reproducibly.",
    tags=("sample_twopass", "join_semi", "agg_welford"),
)
def sample_twopass_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ents = ev.select("user_id").distinct()
    n = ents.count()  # two-pass semantics require the entity count (pass 1)
    k = int(-(-n * 0.02 // 1))  # ceil(pct*n), pct=0.02 per the assignment
    # Deterministic 'shuffle then top pct%': k smallest entities by seeded
    # hash. orderBy().limit() compiles to TakeOrderedAndProject (per-partition
    # heaps + driver merge of k rows) — no global single-partition window.
    sample = ents.orderBy(
        F.md5(F.concat(F.lit("tp:"), F.col("user_id").cast("string"))), F.col("user_id")
    ).limit(k)
    # No broadcast hint: the sample is pct% of ALL entities (unbounded at
    # scale); AQE promotes the semi join to broadcast when it is small.
    kept = ev.join(sample.select("user_id"), "user_id", "left_semi")
    return _stats_agg(kept)


@register(
    "events_hourly",
    oracle=(
        "SELECT event_type, epoch_us(ts) // 3600000000 AS hour_bucket, "
        f"COUNT(*) AS n, {sql_dsum('value')} AS sum_value "
        "FROM events GROUP BY event_type, hour_bucket"
    ),
    doc="Tumbling 1h event-time aggregation on epoch-micro buckets — the batch "
    "twin of the Structured Streaming windowed agg (SURVEY.md §2.11); "
    "timezone-free by construction (pure integer arithmetic).",
    tags=("streaming", "agg_sum_by_key"),
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.expr("ts_us div 3600000000").alias("hour_bucket")
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))


SESSION_GAP_US = 600_000_000  # 10 minutes


@register(
    "session_windows_users",
    oracle=(
        "WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events), "
        "o AS (SELECT user_id, t, value, CASE WHEN lag(t) OVER w IS NULL "
        f"OR t - lag(t) OVER w >= {SESSION_GAP_US} THEN 1 ELSE 0 END AS brk "
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)), "
        "s AS (SELECT user_id, t, value, SUM(brk) OVER (PARTITION BY user_id "
        "ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid FROM o) "
        "SELECT user_id, MIN(t) AS session_start_us, "
        f"MAX(t) + {SESSION_GAP_US} AS session_end_us, COUNT(*) AS n_events, "
        f"{sql_dsum('value')} AS sum_value "
        "FROM s GROUP BY user_id, sid"
    ),
    doc="Per-user session windows (10-min inactivity gap) via Spark's native "
    "session_window — dynamic-length event-time sessions, the groupBy that "
    "tumbling windows can't express; identical semantics to the "
    "gaps-and-islands SQL (lag + running break count) the oracle runs. Works "
    "unchanged as a streaming query with watermark + session_window.",
    tags=("streaming", "window"),
)
def session_windows_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), f"{SESSION_GAP_US // 1_000_000} seconds"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


#: Per-class row-sampling rates in sixteenths: rare classes kept whole, the
#: dominant class decimated — the class-rebalancing downsample every training
#: corpus build runs. Record-level (event_id) hashing, not entity-level: the
#: complement of the entity-complete samplers above.
STRATA_SIXTEENTHS = {"error": 16, "purchase": 8, "signup": 4, "click": 2, "view": 1}

_STRATA_CASE_SQL = (
    "CASE event_type "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in STRATA_SIXTEENTHS.items())
    + " ELSE 0 END"
)


@register(
    "sample_stratified",
    oracle=(
        "SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users, "
        f"{sql_dsum('value', 4)} AS sum_value FROM events "
        f"WHERE ('0x' || {hex_bucket_sql('event_id', 1, 'strat')})::BIGINT "
        f"< {_STRATA_CASE_SQL} GROUP BY event_type"
    ),
    doc="Deterministic stratified (per-class) downsample: each event_type "
    "keeps its own fraction of rows via a seeded-hash bucket threshold — "
    "stateless, shuffle-free, reproducible across engines; the aggregate "
    "shuffles only the survivors (beyond-reference training-data op).",
    tags=("sample_stratified", "hash_mod", "filter_pred"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.conv(hex_bucket("event_id", 1, "strat"), 16, 10).cast("int")
    thr = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in STRATA_SIXTEENTHS.items() for x in kv]
            ),
            F.col("event_type"),
        ),
        F.lit(0),
    )
    return (
        ev.filter(bucket < thr)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", 4).alias("sum_value"),
        )
    )
