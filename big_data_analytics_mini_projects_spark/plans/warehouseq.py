"""Warehouse-maintenance queries (beyond-reference, round 3): columnar ORC
ingestion round trip and incremental snapshot maintenance (the MERGE/upsert
shape) — the daily-batch operations that keep a 100 TB corpus's derived
tables fresh without recomputing them from the raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.aggregates import dsum, sql_dsum
from ..operators.relational import merge_snapshot
from ..sources.tables import load_table
from .registry import register
from .shared import reset_scratch, scratch_path

#: Snapshot cutoff (absolute epoch day): events at or before this day form
#: the "base" snapshot; later events are the incremental batch. The testdata
#: spans epoch days 19723-19752 at every SF, so 19737 splits it mid-range
#: with both sides non-empty.
CUTOFF_DAY = 19737


@register(
    "scan_orc_roundtrip",
    oracle=(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        f"{sql_dsum('l_quantity', 2)} AS sum_qty, "
        f"{sql_dsum('l_extendedprice', 2)} AS sum_price "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    doc="Columnar ORC ingestion round trip: lineitem measures -> partitioned "
    "ORC scratch -> re-scan -> pricing rollup. Proves the second columnar "
    "format end-to-end (schema preservation, double fidelity, predicate-"
    "ready layout); the oracle aggregates the original parquet, so any "
    "round-trip corruption hash-fails.",
    tags=("scan_orc", "sink_collect", "agg_sum_by_key"),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    )
    path = scratch_path("lineitem_orc", sf_dir)
    reset_scratch(path)
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", 2).alias("sum_qty"),
        dsum("l_extendedprice", 2).alias("sum_price"),
    )


@register(
    "incremental_snapshot_merge",
    oracle=(
        "WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, value, "
        "epoch_us(ts) // 86400000000 AS day FROM events), "
        f"base AS (SELECT user_id, COUNT(*) AS n_events, MIN(ts_us) AS first_ts, "
        f"MAX(ts_us) AS last_ts FROM ev WHERE day <= {CUTOFF_DAY} GROUP BY user_id), "
        f"delta AS (SELECT user_id, COUNT(*) AS n_events, MIN(ts_us) AS first_ts, "
        f"MAX(ts_us) AS last_ts FROM ev WHERE day > {CUTOFF_DAY} GROUP BY user_id) "
        "SELECT COALESCE(b.user_id, d.user_id) AS user_id, "
        "CAST(COALESCE(b.n_events, 0) + COALESCE(d.n_events, 0) AS BIGINT) AS n_events, "
        "CAST(LEAST(COALESCE(b.first_ts, d.first_ts), "
        "COALESCE(d.first_ts, b.first_ts)) AS BIGINT) AS first_ts, "
        "CAST(GREATEST(COALESCE(b.last_ts, d.last_ts), "
        "COALESCE(d.last_ts, b.last_ts)) AS BIGINT) AS last_ts "
        "FROM base b FULL JOIN delta d ON b.user_id = d.user_id"
    ),
    doc="Incremental snapshot maintenance (the MERGE INTO shape): a per-user "
    "stats snapshot as of the cutoff day is merged with the post-cutoff "
    "delta batch via ONE full outer join on the key — counts add, min/max "
    "coalesce; users present on either side survive. At 100 TB the delta is "
    "a day's ingest, so the daily cost is O(delta + snapshot), never a "
    "recompute over the raw corpus; both aggregates are partial (map-side "
    "combine) before their single shuffle.",
    tags=("merge_upsert", "agg_sum_by_key"),
)
def incremental_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts_us", F.expr("ts_us div 86400000000").alias("day")
    )

    def _stats(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("first_ts"),
            F.max("ts_us").alias("last_ts"),
        )

    base = _stats(ev.filter(F.col("day") <= CUTOFF_DAY))
    delta = _stats(ev.filter(F.col("day") > CUTOFF_DAY))
    return merge_snapshot(base, delta)


#: Profiled orders columns -> integer-scaled min/max expression (NULL where a
#: stable cross-engine scalar encoding doesn't exist, i.e. free-form strings).
#: Doubles are floored to cents and timestamps to epoch days so every emitted
#: metric is a BIGINT — no float/string formatting divergence between engines.
_PROFILE_COLS: list[tuple[str, str | None]] = [
    ("o_orderkey", "o_orderkey"),
    ("o_custkey", "o_custkey"),
    ("o_orderstatus", None),
    ("o_orderpriority", None),
    ("o_totalprice", "CAST(floor(o_totalprice * 100) AS BIGINT)"),
]


def _profile_oracle() -> str:
    rows = []
    for name, scaled in _PROFILE_COLS:
        mn = f"CAST(MIN({scaled}) AS BIGINT)" if scaled else "CAST(NULL AS BIGINT)"
        mx = f"CAST(MAX({scaled}) AS BIGINT)" if scaled else "CAST(NULL AS BIGINT)"
        rows.append(
            f"SELECT '{name}' AS col_name, COUNT(*) AS n_rows, "
            f"CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls, "
            f"COUNT(DISTINCT {name}) AS n_distinct, "
            f"{mn} AS min_scaled, {mx} AS max_scaled FROM orders"
        )
    return " UNION ALL ".join(rows)


@register(
    "profile_table_stats",
    oracle=_profile_oracle(),
    doc="ANALYZE-TABLE-shaped column profiling of orders: per-column row/"
    "null/distinct counts plus integer-scaled min/max (doubles floored to "
    "cents) in ONE pass over the table — the stats a cost-based optimizer "
    "or data-quality gate collects before planning against a 100 TB table. "
    "All metrics are BIGINT so the profile is hash-comparable across "
    "engines with no float or string formatting drift.",
    tags=("skew", "quality", "agg_distinct"),
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # ONE aggregate row holding every column's stats (single table pass;
    # Catalyst handles the multi-distinct via Expand), then a stack() unpivot
    # of the bounded 1xK row into long form — no per-column rescans.
    aggs = []
    for name, scaled in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{name}__n_rows"),
            (F.count(F.lit(1)) - F.count(name)).alias(f"{name}__n_nulls"),
            F.count_distinct(F.col(name)).alias(f"{name}__n_distinct"),
            (
                F.expr(f"MIN({scaled})").cast("long")
                if scaled
                else F.lit(None).cast("long")
            ).alias(f"{name}__min_scaled"),
            (
                F.expr(f"MAX({scaled})").cast("long")
                if scaled
                else F.lit(None).cast("long")
            ).alias(f"{name}__max_scaled"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', {name}__n_rows, {name}__n_nulls, {name}__n_distinct, "
        f"{name}__min_scaled, {name}__max_scaled"
        for name, _ in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_scaled, max_scaled)"
        )
    )
