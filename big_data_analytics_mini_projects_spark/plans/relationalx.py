"""Relational extensions beyond the reference's declared surface: grouping
sets (ROLLUP/CUBE), a TPC-H Q5-shaped multi-join, a time-range (interval)
join, frame-spec rolling windows, and exact distributed quantiles.

The reference computes none of these (SURVEY.md §2.4 "Not present: grouping
sets / cube / rollup"; §2.3 "no range joins"; §2.9 "frame specs unneeded"),
but a training-data pipeline at 100 TB needs all of them, so they land here
as first-class oracle-checked queries. Scale notes per query:

- ROLLUP/CUBE run as a single shuffle: Spark expands grouping sets with the
  `Expand` operator *before* the exchange, so partial aggregation still
  applies — no per-grouping-set rescan of the fact table.
- The multi-join hints broadcast only for the provably-bounded nation/region
  set; customer/supplier are AQE-decided (broadcast while they fit, shuffled
  hash at scale), so at test SF the only shuffle of fact rows is the
  lineitem⋈orders equi-join plus the final per-nation aggregate.
- The range join rides an equi-join on the entity key (user_id) with the
  time predicate as a residual filter — never a cross product; skewed users
  would be handled by AQE skew-split since the join is a plain SortMergeJoin.
- Rolling windows shuffle once on the partition key; the frame is evaluated
  in a streaming pass over each sorted partition (no buffering beyond the
  4-row frame).
- Quantiles use the sort-rank formulation (row_number over a one-shuffle
  window) instead of Spark's builtin `percentile`, which collects a
  value->count map per group on a single reducer — the rank form spills
  gracefully and returns actual data values, so it is exact and
  engine-portable (no interpolation arithmetic to mismatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.text import round_stable, sql_round_stable
from ..operators.aggregates import dsum, sql_dsum
from ..sources.tables import load_table, spread
from .registry import register

#: NULL-key sentinel for subtotal rows: makes grouping-set output sortable
#: everywhere (pandas can't order None vs str) and unambiguous (no data value
#: collides with it in the name dimensions used here).
_ALL = "<all>"


@register(
    "rollup_revenue",
    oracle=(
        "SELECT coalesce(r_name, '<all>') AS r_name, "
        "coalesce(n_name, '<all>') AS n_name, "
        "COUNT(o_orderkey) AS n_orders, "
        f"{sql_dsum('o_totalprice')} AS total_price "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY ROLLUP (r_name, n_name)"
    ),
    doc="Hierarchical subtotals region -> nation -> grand total via ROLLUP; "
    "one Expand + one shuffle, partial aggs intact (beyond-reference).",
    tags=("rollup", "agg_sum_by_key", "join_broadcast"),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        # dims carries every customer (unbounded) — no hint, AQE decides
        orders.join(dims, orders.o_custkey == F.col("c_custkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce("r_name", F.lit(_ALL)).alias("r_name"),
            F.coalesce("n_name", F.lit(_ALL)).alias("n_name"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "cube_orders_status_priority",
    oracle=(
        "SELECT coalesce(o_orderstatus, '<all>') AS o_orderstatus, "
        "coalesce(o_orderpriority, '<all>') AS o_orderpriority, "
        "COUNT(o_orderkey) AS n_orders, "
        f"{sql_dsum('o_totalprice')} AS total_price "
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"
    ),
    doc="All 2^2 grouping sets over (status, priority) via CUBE in a single "
    "shuffle (beyond-reference).",
    tags=("cube", "agg_sum_by_key"),
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit(_ALL)).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit(_ALL)).alias("o_orderpriority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "tpch_q5_local_supplier",
    oracle=(
        "SELECT n_name, "
        f"{sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE c_nationkey = s_nationkey AND r_name = 'ASIA' "
        "GROUP BY n_name"
    ),
    doc="TPC-H Q5 shape (local-supplier volume): five-way join; the bounded "
    "nation set is hint-broadcast, customer/supplier are AQE-decided, so at "
    "small SF fact rows shuffle exactly once for lineitem><orders and once "
    "for the final per-nation agg, and at 100 TB the plan degrades "
    "gracefully instead of OOMing the broadcast.",
    tags=("multi_join", "join_broadcast", "filter_pred", "agg_dotprod"),
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer/supplier scale with the data — unhinted, AQE picks
        # broadcast while they fit and demotes at 100 TB; only the bounded
        # nation set keeps the hint
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
    )


@register(
    "range_join_purchase_context",
    oracle=(
        "SELECT p.event_id AS purchase_id, COUNT(v.event_id) AS n_views, "
        f"{sql_dsum('v.value', 4)} AS view_value "
        "FROM events p JOIN events v ON p.user_id = v.user_id "
        "AND v.event_type = 'view' AND p.event_type = 'purchase' "
        "AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts < p.ts "
        "GROUP BY p.event_id"
    ),
    doc="Time-range (interval) self-join: views by the same user in the 30 "
    "minutes before each purchase. Equi-join on user_id carries the range "
    "predicate as a residual filter — no cross product at any scale "
    "(beyond-reference).",
    tags=("range_join", "filter_pred", "agg_sum_by_key"),
)
def range_join_purchase_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
    )
    joined = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("v_ts") < F.col("p_ts")),
    )
    return joined.groupBy("purchase_id").agg(
        F.count("view_id").alias("n_views"),
        dsum("v_value", 4).alias("view_value"),
    )


@register(
    "rolling_avg_user_value",
    oracle=(
        "SELECT event_id, user_id, "
        + sql_round_stable(
            "CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) "
            "/ COUNT(*) OVER w"
        )
        + " AS roll_avg "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
    ),
    doc="Frame-spec rolling mean: last-4-events average per user. One "
    "shuffle on user_id, then a streaming pass per sorted partition; the "
    "decimal sufficient-statistic sum keeps it bit-stable across engines "
    "(beyond-reference).",
    tags=("window_frame", "window", "agg_welford"),
)
def rolling_avg_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    dec = F.col("value").cast("decimal(18,4)")
    return ev.select(
        "event_id",
        "user_id",
        round_stable(
            F.sum(dec).over(w).cast("double") / F.count(F.lit(1)).over(w)
        ).alias("roll_avg"),
    )


#: Exact quantile by sort-rank: the value at 1-indexed row ceil(q*n) of the
#: group's sorted order (discrete / lower quantile). Returns real data values,
#: so there is no interpolation arithmetic to diverge between engines.
_QUANTILE_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders)
SELECT o_orderpriority,
       MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN o_totalprice END) AS p25,
       MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN o_totalprice END) AS p50,
       MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN o_totalprice END) AS p75,
       MAX(CASE WHEN rn = n THEN o_totalprice END) AS p100
FROM ranked GROUP BY o_orderpriority
"""


@register(
    "quantile_order_value",
    oracle=_QUANTILE_SQL,
    doc="Exact distributed quantiles (p25/p50/p75/max of order value per "
    "priority) via sort-rank, not the builtin `percentile` whose per-group "
    "value map concentrates on one reducer; rank form is one shuffle and "
    "spills gracefully at 100 TB (beyond-reference).",
    tags=("quantile", "window", "sort_out"),
)
def quantile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number()
        .over(wp.orderBy("o_totalprice", "o_orderkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    pick = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("bigint"),
            F.col("o_totalprice"),
        )
    )
    return ranked.groupBy("o_orderpriority").agg(
        pick(0.25).alias("p25"),
        pick(0.50).alias("p50"),
        pick(0.75).alias("p75"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("o_totalprice"))).alias("p100"),
    )


#: Known event classes, pinned so the pivot's output columns are static —
#: at scale you never want pivot's values-discovery pre-pass (an extra scan).
_EVENT_CLASSES = ["click", "view", "purchase", "signup", "error"]


@register(
    "pivot_user_event_matrix",
    oracle=(
        "SELECT user_id, "
        + ", ".join(
            f"COUNT(*) FILTER (WHERE event_type = '{c}') AS {c}"
            for c in _EVENT_CLASSES
        )
        + " FROM events GROUP BY user_id"
    ),
    doc="Pivot (long -> wide): per-user event-class count matrix. Lowered to "
    "conditional aggregation rather than groupBy().pivot(): with a pinned "
    "class list the two are semantically identical, but .pivot() compiles "
    "to TWO shuffles (pre-aggregate on (key, class), then pivotfirst) while "
    "conditional aggregates are ONE partial-agg shuffle — plan-asserted in "
    "tests/test_plans.py (beyond-reference).",
    tags=("pivot", "agg_count_by_key"),
)
def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == c, 1)).alias(c)
            for c in _EVENT_CLASSES
        ]
    )


_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "unpivot_lineitem_measures",
    oracle=" UNION ALL ".join(
        f"SELECT l_returnflag, '{m}' AS measure, COUNT(*) AS n, "
        f"{sql_dsum(m, 4)} AS total FROM lineitem GROUP BY l_returnflag"
        for m in _MEASURES
    ),
    doc="Unpivot (wide -> long): four lineitem measures melted to "
    "(measure, value) rows then aggregated per (returnflag, measure) — one "
    "scan + one shuffle via the Expand operator, vs the oracle's four-scan "
    "UNION ALL formulation (beyond-reference).",
    tags=("unpivot", "agg_sum_by_key"),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the Expand (unpivot) multiplies rows 4x and feeds the partial
    # aggregate; on the local single-split scan that whole pipeline ran on
    # one core (guide §2.5). No-op when the scan has enough splits.
    li = spread(load_table(spark, sf_dir, "lineitem"))
    long = li.unpivot("l_returnflag", _MEASURES, "measure", "val")
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"), dsum("val", 4).alias("total")
    )


@register(
    "window_ranks_customers",
    oracle=(
        "SELECT c_mktsegment, c_custkey, "
        "rank() OVER w AS rnk, dense_rank() OVER w AS drnk, "
        + sql_round_stable("percent_rank() OVER w") + " AS prnk, "
        + sql_round_stable("cume_dist() OVER w") + " AS cd, "
        "ntile(4) OVER (PARTITION BY c_mktsegment "
        "ORDER BY c_acctbal DESC, c_custkey) AS quartile "
        "FROM customer WINDOW w AS "
        "(PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)"
    ),
    doc="The analytic ranking family (rank / dense_rank / percent_rank / "
    "cume_dist / ntile) per market segment in ONE window pass: one shuffle "
    "on the partition key, one sort, five functions (beyond-reference). "
    "ntile gets a unique-ordering tiebreaker; the rank family is "
    "ties-deterministic by definition.",
    tags=("rank_window", "window"),
)
def window_ranks_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    wt = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        round_stable(F.percent_rank().over(w)).alias("prnk"),
        round_stable(F.cume_dist().over(w)).alias("cd"),
        F.ntile(4).over(wt).alias("quartile"),
    )


@register(
    "listagg_nation_names",
    oracle=(
        "SELECT n_name, COUNT(*) AS n_customers, "
        "array_to_string(list_sort(list(c_name))[1:5], ',') AS first5 "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name"
    ),
    doc="Ordered string aggregation (LISTAGG shape): first five customer "
    "names per nation, collect_list made deterministic by array_sort before "
    "the slice — group-collect (agg_collect) composed with scalar array "
    "functions, no UDF (beyond-reference).",
    tags=("listagg", "agg_collect", "join_broadcast"),
)
def listagg_nation_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_name", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.array_join(
            F.slice(F.array_sort(F.collect_list("c_name")), 1, 5), ","
        ).alias("first5"),
    )


@register(
    "tpch_q18_large_orders",
    oracle=(
        "WITH big AS (SELECT l_orderkey, "
        f"{sql_dsum('l_quantity')} AS sum_qty "
        "FROM lineitem GROUP BY l_orderkey "
        f"HAVING {sql_dsum('l_quantity')} > 250) "
        "SELECT c_name, o_custkey, o_orderkey, "
        "strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str, o_totalprice, sum_qty "
        "FROM big JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"
    ),
    doc="TPC-H Q18 shape (large-volume orders): the HAVING aggregate runs "
    "FIRST and collapses lineitem to the ~1% qualifying orders; the "
    "qualifying set and customer join unhinted (AQE broadcasts them while "
    "small — they grow with the fact table, so no pinned hint); top-100 "
    "compiles to TakeOrderedAndProject (per-partition heaps).",
    tags=("multi_join", "agg_having_count", "topk", "join_broadcast"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        # the HAVING-qualifying set is ~1% of orders and customer is the full
        # dimension — both grow with the fact table, so neither is hinted;
        # AQE promotes to broadcast while they fit the runtime threshold
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "histogram_order_values",
    oracle=(
        "SELECT CAST(least(floor(o_totalprice / 5000), 19) AS BIGINT) AS bucket, "
        "COUNT(*) AS n, "
        f"{sql_dsum('o_totalprice')} AS total "
        "FROM orders GROUP BY bucket"
    ),
    doc="Fixed-width histogram of order values (5000-wide buckets, top bucket "
    "open-ended): binning is a pure scalar projection so the whole histogram "
    "is one partial-agg shuffle of 20 groups — the profile-a-column "
    "primitive that runs at any scale (beyond-reference).",
    tags=("histogram", "agg_count_by_key"),
)
def histogram_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 5000), F.lit(19)).cast("bigint")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("total"),
        )
    )
