"""TPC-H completion batch — the 13 query shapes (Q2, Q7-Q12, Q15-Q17,
Q20-Q22) that close out the full 22-query relational surface (Q1/Q3/Q4/Q5/
Q13/Q18 live in core/decisionq/relationalx; Q6/Q14/Q19 in tpchx).

The testdata schema is TPC-H-ish, not TPC-H: there is no partsupp table and
no l_commitdate/l_receiptdate/l_shipmode/c_phone/p_container column. Each
query below keeps its original's PLAN SHAPE (the operator composition that
makes it a benchmark: correlated min, EXISTS/NOT EXISTS, scalar-subquery
thresholds, nested aggregation) and re-grounds the missing columns in what
the schema has — documented per query. Part-supplier facts come from
lineitem's (l_partkey, l_suppkey) pairs, the only part-supplier relation in
this schema.

Scale notes (shared): every dimension join goes through join_auto (AQE
broadcasts at test SF, degrades to shuffled hash at 100 TB); nation/region
joins use join_broadcast (25/5 rows, bounded by the data model); scalar
thresholds are 1-row aggregate broadcasts (BNLJ allowlisted); every LIMIT
sits under a total order (TakeOrderedAndProject, no global sort).

Determinism: money sums via exact decimal sufficient statistics (dsum);
ratios/quotients rounded with round_stable; quantity thresholds compared on
integral doubles (l_quantity is integral 1..50, so double sums of it are
exact and order-independent in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.text import round_stable, sql_round_stable
from ..operators.aggregates import dsum, sql_dsum
from ..operators.relational import join_auto, join_broadcast, topk
from ..sources.tables import load_table
from .registry import register

# Date windows inside the testdata's 1995-2001 span.
Y96_LO = "1996-01-01 00:00:00"
Y97_LO = "1997-01-01 00:00:00"
Y98_LO = "1998-01-01 00:00:00"
Q10_LO = "1996-07-01 00:00:00"
Q10_HI = "1996-10-01 00:00:00"
Q15_HI = "1996-04-01 00:00:00"
Q22_CUTOFF = "2000-01-01 00:00:00"


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


@register(
    "tpch_q2_min_price_supplier",
    oracle=(
        "WITH redparts AS (SELECT p_partkey FROM part "
        "WHERE p_size < 25 AND p_name LIKE '%red%'), "
        "offers AS (SELECT l_partkey, l_suppkey, "
        "MIN(l_extendedprice / l_quantity) AS supp_price "
        "FROM lineitem JOIN redparts ON l_partkey = p_partkey GROUP BY 1, 2), "
        "m AS (SELECT l_partkey, l_suppkey, supp_price, "
        "MIN(supp_price) OVER (PARTITION BY l_partkey) AS best_price FROM offers) "
        "SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, "
        + sql_round_stable("supp_price")
        + " AS supp_price "
        "FROM m JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON n_nationkey = s_nationkey "
        "WHERE supp_price = best_price "
        "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 50"
    ),
    doc="TPC-H Q2 shape: minimum-cost supplier per part — the correlated-MIN "
    "subquery benchmark. partsupp is absent, so the part-supplier offer "
    "relation is derived from lineitem: a supplier's offer price for a part "
    "is its minimum observed unit price (l_extendedprice/l_quantity, an "
    "IEEE-exact per-row division identical in both engines; MIN is order-"
    "independent so the double equality against the per-part window MIN is "
    "deterministic). Part filter broadcasts into the fact scan BEFORE the "
    "pair aggregation; the correlated min is one window over the already-"
    "aggregated (part,supp) frame, not a second shuffle+self-join.",
    tags=("join_broadcast", "topk", "window", "agg_combiner"),
)
def tpch_q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") < 25) & F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("price"),
    )
    offers = (
        join_auto(li, red, li.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("price").alias("supp_price"))
    )
    best = F.min("supp_price").over(Window.partitionBy("l_partkey"))
    cand = offers.withColumn("best_price", best).filter(
        F.col("supp_price") == F.col("best_price")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    out = join_broadcast(
        join_auto(cand, sup, cand.l_suppkey == sup.s_suppkey),
        nat,
        F.col("s_nationkey") == nat.n_nationkey,
    ).select(
        "s_acctbal",
        "s_name",
        "n_name",
        F.col("l_partkey").alias("p_partkey"),
        round_stable("supp_price").alias("supp_price"),
    )
    return topk(
        out,
        [F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"],
        50,
    )


# Pair chosen populated at every tested SF (18 qualifying lines even at
# sf0.001) so the differential check pins values, not an empty frame.
_Q7_PAIR = ("NATION_18", "NATION_19")


@register(
    "tpch_q7_volume_shipping",
    oracle=(
        "WITH v AS (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(year(l_shipdate) AS INTEGER) AS l_year, "
        "l_extendedprice * (1 - l_discount) AS vol "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation n1 ON n1.n_nationkey = s_nationkey "
        "JOIN nation n2 ON n2.n_nationkey = c_nationkey "
        f"WHERE l_shipdate >= TIMESTAMP '{Y96_LO}' "
        f"AND l_shipdate < TIMESTAMP '{Y98_LO}' "
        f"AND ((n1.n_name = '{_Q7_PAIR[0]}' AND n2.n_name = '{_Q7_PAIR[1]}') "
        f"OR (n1.n_name = '{_Q7_PAIR[1]}' AND n2.n_name = '{_Q7_PAIR[0]}'))) "
        f"SELECT supp_nation, cust_nation, l_year, {sql_dsum('vol', 4)} AS revenue, "
        "COUNT(*) AS n_lines FROM v GROUP BY 1, 2, 3"
    ),
    doc="TPC-H Q7 shape: bilateral shipping volume between two nations by "
    "ship year — the two-sided dimension-filter benchmark. The nation pair "
    "filter is pushed onto BOTH dimension paths before touching the fact "
    "table: supplier and customer are each pre-joined (broadcast) to the "
    "2-row filtered nation frame, so the lineitem⋈orders join is the only "
    "full-size exchange and the pair disjunction runs on two tiny attached "
    "name columns.",
    tags=("join_broadcast", "filter_pred", "agg_combiner"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*_Q7_PAIR)
    )
    sup = join_broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"),
        nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    cust = join_broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
        nat.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")),
        F.col("c_nationkey") == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Y96_LO)) & (F.col("l_shipdate") < _ts(Y98_LO))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = (
        join_auto(li, orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .filter(
            (
                (F.col("supp_nation") == _Q7_PAIR[0])
                & (F.col("cust_nation") == _Q7_PAIR[1])
            )
            | (
                (F.col("supp_nation") == _Q7_PAIR[1])
                & (F.col("cust_nation") == _Q7_PAIR[0])
            )
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("vol", 4).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


_Q8_REGION = "ASIA"
_Q8_TYPE = "STANDARD"
_Q8_NATION = "NATION_7"

_Q8_NAT_VOL = sql_dsum(
    f"CASE WHEN supp_nation = '{_Q8_NATION}' THEN vol ELSE 0 END", 4
)
_Q8_TOT_VOL = sql_dsum("vol", 4)


@register(
    "tpch_q8_market_share",
    oracle=(
        "WITH v AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, "
        "ns.n_name AS supp_nation, l_extendedprice * (1 - l_discount) AS vol "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation nc ON nc.n_nationkey = c_nationkey "
        "JOIN region ON r_regionkey = nc.n_regionkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ns ON ns.n_nationkey = s_nationkey "
        f"WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_TYPE}' "
        f"AND o_orderdate >= TIMESTAMP '{Y96_LO}' "
        f"AND o_orderdate < TIMESTAMP '{Y98_LO}') "
        f"SELECT o_year, {_Q8_NAT_VOL} AS nation_volume, "
        f"{_Q8_TOT_VOL} AS total_volume, "
        + sql_round_stable(f"{_Q8_NAT_VOL} / {_Q8_TOT_VOL}")
        + " AS mkt_share FROM v GROUP BY o_year"
    ),
    doc="TPC-H Q8 shape: one nation's market share of a part type sold into "
    "one region, by order year — the deep-join + conditional-ratio "
    "benchmark (8 relations). Customer-side region membership and the part "
    "type filter both reduce the fact stream before the wide join; the "
    "share is two exact-decimal conditional sums folded map-side, divided "
    "once per year row and rounded binary-stably.",
    tags=("join_broadcast", "agg_combiner", "filter_pred"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    # customers in the target region: nation⋈region (25x5, driver-side tiny)
    region_nations = join_broadcast(
        nat, reg, nat.n_regionkey == reg.r_regionkey
    ).select(F.col("n_nationkey").alias("rn_key"))
    cust = join_broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
        region_nations,
        F.col("c_nationkey") == F.col("rn_key"),
    ).select("c_custkey")
    sup = join_broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"),
        nat.select("n_nationkey", F.col("n_name").alias("supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == _Q8_TYPE
    ).select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(Y96_LO)) & (F.col("o_orderdate") < _ts(Y98_LO))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    j = (
        join_auto(li, parts, li.l_partkey == parts.p_partkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey, "inner")
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            "supp_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol"),
        )
    )
    nation_vol = dsum(
        F.when(F.col("supp_nation") == _Q8_NATION, F.col("vol")).otherwise(F.lit(0)),
        4,
    )
    total_vol = dsum("vol", 4)
    return j.groupBy("o_year").agg(
        nation_vol.alias("nation_volume"),
        total_vol.alias("total_volume"),
        round_stable(nation_vol / total_vol).alias("mkt_share"),
    )


@register(
    "tpch_q9_product_profit",
    oracle=(
        "WITH v AS (SELECT n_name AS nation, "
        "CAST(year(o_orderdate) AS INTEGER) AS o_year, "
        "l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity "
        "AS amount "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN nation ON n_nationkey = s_nationkey "
        "WHERE p_name LIKE '%widget%') "
        f"SELECT nation, o_year, {sql_dsum('amount', 4)} AS sum_profit, "
        "COUNT(*) AS n_lines FROM v GROUP BY 1, 2"
    ),
    doc="TPC-H Q9 shape: profit on a product line by supplier nation and "
    "order year. ps_supplycost is absent, so unit cost is grounded as half "
    "the part's retail price (0.5 * p_retailprice * l_quantity — same IEEE "
    "multiply order in both engines before the exact-decimal cast). The "
    "part-name filter broadcasts into the fact scan; profit is one "
    "map-side-combined decimal sum per (nation, year).",
    tags=("join_broadcast", "agg_combiner", "filter_pred"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    j = (
        join_auto(li, parts, li.l_partkey == parts.p_partkey)
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
    )
    j = join_broadcast(j, nat, F.col("s_nationkey") == nat.n_nationkey)
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", 4).alias("sum_profit"), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "tpch_q10_returned_items",
    oracle=(
        "SELECT c_custkey, c_name, c_acctbal, n_name, "
        f"{sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation ON n_nationkey = c_nationkey "
        "WHERE l_returnflag = 'R' "
        f"AND o_orderdate >= TIMESTAMP '{Q10_LO}' "
        f"AND o_orderdate < TIMESTAMP '{Q10_HI}' "
        "GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
    doc="TPC-H Q10 shape: top 20 customers by lost revenue on returned items "
    "in one quarter. Return-flag and order-date predicates both push to "
    "their scans; revenue is an exact decimal so the top-k order (revenue "
    "DESC, c_custkey tiebreak) is a total order and compiles to "
    "TakeOrderedAndProject.",
    tags=("join_broadcast", "topk", "agg_combiner"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(Q10_LO)) & (F.col("o_orderdate") < _ts(Q10_HI))
    ).select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation")
    j = (
        join_auto(li, orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
    )
    j = join_broadcast(j, nat, F.col("c_nationkey") == nat.n_nationkey)
    agg = (
        j.select(
            "c_custkey", "c_name", "c_acctbal", "n_name",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum("rev", 4).alias("revenue"))
    )
    return topk(agg, [F.col("revenue").desc(), "c_custkey"], 20)


_Q11_NATION = "NATION_3"
_Q11_MULT = 2.0


@register(
    "tpch_q11_important_parts",
    oracle=(
        "WITH v AS (SELECT l_partkey AS p_partkey, "
        f"{sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS part_value "
        "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON n_nationkey = s_nationkey "
        f"WHERE n_name = '{_Q11_NATION}' GROUP BY 1), "
        f"t AS (SELECT {sql_dsum('part_value', 4)} AS tot, "
        "COUNT(*) AS n FROM v) "
        "SELECT p_partkey, part_value FROM v, t "
        f"WHERE part_value > {_Q11_MULT} * tot / n"
    ),
    doc="TPC-H Q11 shape: parts representing a significant share of one "
    "nation's traded value — the scalar-subquery HAVING benchmark. "
    "ps_supplycost*ps_availqty is absent; part value is grounded as the "
    "nation's discounted lineitem revenue per part. The original's "
    "FRACTION*total threshold is non-selective on this flat synthetic "
    "distribution (TPC-H itself rescales the fraction by 1/SF), so the "
    "threshold re-grounds scale-invariantly as 2x the MEAN part value — "
    "still a global scalar subquery, selective at every SF. The nation "
    "filter reduces supplier to a handful of rows that broadcast into the "
    "fact scan; the (total, count) scalar is a 1-row aggregate broadcast "
    "(BNLJ allowlisted) and the threshold expression is the same IEEE "
    "multiply/divide order in both engines over exact-decimal sums.",
    tags=("join_broadcast", "agg_combiner", "filter_pred"),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == _Q11_NATION)
    sup = join_broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"),
        nat,
        F.col("s_nationkey") == nat.n_nationkey,
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    v = (
        join_auto(li, sup, li.l_suppkey == sup.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"),
        )
        .groupBy("p_partkey")
        .agg(dsum("val", 4).alias("part_value"))
    )
    tot = v.agg(dsum("part_value", 4).alias("tot"), F.count(F.lit(1)).alias("n"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") > F.lit(_Q11_MULT) * F.col("tot") / F.col("n"))
        .select("p_partkey", "part_value")
    )


_Q12_HIGH = ("1-URGENT", "2-HIGH")


@register(
    "tpch_q12_priority_lines",
    oracle=(
        "SELECT l_linestatus, "
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        f"WHERE l_shipdate >= TIMESTAMP '{Y96_LO}' "
        f"AND l_shipdate < TIMESTAMP '{Y97_LO}' "
        "GROUP BY 1"
    ),
    doc="TPC-H Q12 shape: high- vs low-priority line counts per line status "
    "for one ship year. l_shipmode/l_commitdate are absent, so the grouping "
    "re-grounds on l_linestatus while keeping Q12's benchmark core: a "
    "fact⋈fact join feeding two complementary conditional counts folded "
    "map-side. The ship-date filter pushes to the lineitem scan and "
    "projects just two columns into the join.",
    tags=("agg_combiner", "filter_pred"),
)
def tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Y96_LO)) & (F.col("l_shipdate") < _ts(Y97_LO))
    ).select("l_orderkey", "l_linestatus")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin(*_Q12_HIGH)
    return (
        join_auto(li, orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=(
        "WITH rev AS (SELECT l_suppkey, "
        f"{sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue "
        "FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{Y96_LO}' "
        f"AND l_shipdate < TIMESTAMP '{Q15_HI}' GROUP BY 1), "
        "m AS (SELECT MAX(total_revenue) AS mx FROM rev) "
        "SELECT s_suppkey, s_name, total_revenue "
        "FROM rev JOIN supplier ON s_suppkey = l_suppkey, m "
        "WHERE total_revenue = mx ORDER BY s_suppkey"
    ),
    doc="TPC-H Q15 shape: the top revenue supplier for one quarter — the "
    "view + scalar-MAX-subquery benchmark. Revenue per supplier is an "
    "exact decimal sum, so the equality join against the 1-row broadcast "
    "MAX (BNLJ allowlisted) is deterministic; ties would all be emitted, "
    "as in the original.",
    tags=("agg_combiner", "join_broadcast"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts(Y96_LO)) & (F.col("l_shipdate") < _ts(Q15_HI))
        )
        .select(
            "l_suppkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .groupBy("l_suppkey")
        .agg(dsum("rev", 4).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)


@register(
    "tpch_q16_supplier_cnt",
    oracle=(
        "WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem), "
        "good AS (SELECT l_partkey, l_suppkey FROM ps WHERE l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)) "
        "SELECT p_brand, p_type, p_size, "
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
        "FROM good JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO' "
        f"AND p_size IN {_Q16_SIZES} "
        "GROUP BY 1, 2, 3"
    ),
    doc="TPC-H Q16 shape: how many suppliers can supply each qualifying "
    "(brand, type, size) — the NOT-IN + COUNT DISTINCT benchmark. The "
    "part-supplier relation is lineitem's distinct (l_partkey, l_suppkey) "
    "pairs (partsupp is absent); the supplier-complaint exclusion is "
    "grounded as negative account balance and runs as a broadcast anti "
    "join before the distinct aggregation.",
    tags=("join_anti", "agg_distinct", "filter_pred"),
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    good = pairs.join(bad, pairs.l_suppkey == bad.s_suppkey, "left_anti")
    parts = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*_Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        join_auto(good, parts, good.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle=(
        "WITH med AS (SELECT p_partkey FROM part "
        "WHERE p_brand = 'Brand#2' AND p_type = 'MEDIUM'), "
        "st AS (SELECT l_partkey, SUM(l_quantity) AS sum_qty, "
        "COUNT(*) AS cnt FROM lineitem JOIN med ON p_partkey = l_partkey "
        "GROUP BY 1) "
        f"SELECT {sql_round_stable(sql_dsum('l_extendedprice', 2) + ' / 7.0')} "
        "AS avg_yearly, COUNT(*) AS n_lines "
        "FROM lineitem JOIN st ON lineitem.l_partkey = st.l_partkey "
        "WHERE l_quantity * 5 * cnt < sum_qty"
    ),
    doc="TPC-H Q17 shape: average yearly revenue lost on small-quantity "
    "orders of one brand/type — the correlated-AVG-subquery benchmark "
    "(p_container is absent; the part filter re-grounds on brand+type). "
    "The per-part average is computed as (sum, count) sufficient "
    "statistics and the 'quantity < 0.2*avg' predicate is algebraically "
    "cleared of division: 5*qty*cnt < sum_qty, exact in both engines "
    "because l_quantity is integral so its double sums are exact.",
    tags=("agg_combiner", "join_broadcast", "filter_pred"),
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    med = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_med = join_auto(li, med, li.l_partkey == med.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    st = li_med.groupBy(F.col("l_partkey").alias("st_partkey")).agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        join_auto(li_med, st, li_med.l_partkey == st.st_partkey)
        .filter(F.col("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            round_stable(dsum("l_extendedprice", 2) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q20_promotion_suppliers",
    oracle=(
        "WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'), "
        "q AS (SELECT l_suppkey, l_partkey, "
        f"SUM(CASE WHEN l_shipdate >= TIMESTAMP '{Y96_LO}' "
        f"AND l_shipdate < TIMESTAMP '{Y97_LO}' THEN l_quantity ELSE 0 END) "
        "AS qty96, SUM(l_quantity) AS qty_all "
        "FROM lineitem JOIN red ON p_partkey = l_partkey GROUP BY 1, 2) "
        "SELECT s_suppkey, s_name FROM supplier "
        "WHERE s_suppkey IN (SELECT l_suppkey FROM q WHERE 2 * qty96 > qty_all) "
        "ORDER BY s_suppkey"
    ),
    doc="TPC-H Q20 shape: suppliers with excess availability of a part line "
    "— the nested-aggregate + semi-join-chain benchmark. ps_availqty is "
    "absent; the condition re-grounds as 'shipped more than half their "
    "all-time volume of a red part in 1996' (2*qty96 > qty_all, exact on "
    "integral-double quantity sums). Part filter broadcasts into the fact "
    "scan; the qualifying supplier set semi-joins supplier.",
    tags=("join_semi", "agg_combiner", "filter_pred"),
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    in96 = (F.col("l_shipdate") >= _ts(Y96_LO)) & (F.col("l_shipdate") < _ts(Y97_LO))
    q = (
        join_auto(li, red, li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in96, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("qty96"),
            F.sum("l_quantity").alias("qty_all"),
        )
        .filter(2 * F.col("qty96") > F.col("qty_all"))
        .select("l_suppkey")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sup.join(q, sup.s_suppkey == q.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle=(
        "WITH l1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem "
        "JOIN orders ON o_orderkey = l_orderkey "
        "WHERE l_returnflag = 'R' AND o_orderstatus = 'F') "
        "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait "
        "FROM l1 JOIN supplier ON s_suppkey = l_suppkey "
        "WHERE EXISTS (SELECT 1 FROM lineitem l2 "
        "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
        "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey "
        "AND l3.l_returnflag = 'R') "
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"
    ),
    doc="TPC-H Q21 shape: suppliers who alone failed multi-supplier orders — "
    "the EXISTS + NOT-EXISTS double-correlation benchmark. l_receiptdate/"
    "l_commitdate are absent, so 'kept waiting' re-grounds on the return "
    "flag: on a finished ('F') multi-supplier order, the supplier whose "
    "lines were returned while no co-supplier's were. The two correlated "
    "subqueries compile to a semi join and an anti join on (orderkey, "
    "suppkey<>) — each one shuffle on orderkey, no per-row re-scan.",
    tags=("join_semi", "join_anti", "topk"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l1 = (
        join_auto(
            li.filter(F.col("l_returnflag") == "R"),
            orders_f,
            F.col("l_orderkey") == orders_f.o_orderkey,
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    cand = l1.join(
        l2,
        (l1.l_orderkey == F.col("o2")) & (l1.l_suppkey != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    agg = (
        join_auto(cand, sup, cand.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return topk(agg, [F.col("numwait").desc(), "s_name"], 20)


_Q22_BUCKETS = (0, 2, 4)


@register(
    "tpch_q22_dormant_customers",
    oracle=(
        "WITH pool AS (SELECT c_custkey, c_acctbal, c_nationkey % 7 AS cntry "
        f"FROM customer WHERE c_nationkey % 7 IN {_Q22_BUCKETS}), "
        "a AS (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) "
        "/ COUNT(*) AS avg_bal FROM pool WHERE c_acctbal > 0), "
        "dormant AS (SELECT cntry, c_acctbal FROM pool, a "
        "WHERE c_acctbal > avg_bal AND c_custkey NOT IN "
        "(SELECT o_custkey FROM orders "
        f"WHERE o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')) "
        "SELECT cntry, CAST(COUNT(*) AS BIGINT) AS numcust, "
        f"{sql_dsum('c_acctbal', 2)} AS totacctbal "
        "FROM dormant GROUP BY cntry"
    ),
    doc="TPC-H Q22 shape: well-funded customers gone dormant, by country "
    "bucket — the scalar-subquery + anti-join benchmark. c_phone is "
    "absent, so the country code re-grounds as c_nationkey % 7 (same "
    "integer modulo in both engines); 'no orders in 7 years' re-grounds "
    "as no orders on/after 2000-01-01 inside the data span. The average "
    "balance is an exact-decimal sum over the pool divided once (1-row "
    "broadcast, BNLJ allowlisted); recent order keys anti-join the pool.",
    tags=("join_anti", "agg_combiner", "filter_pred"),
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    pool = (
        load_table(spark, sf_dir, "customer")
        .withColumn("cntry", F.col("c_nationkey") % 7)
        .filter(F.col("cntry").isin(*_Q22_BUCKETS))
        .select("c_custkey", "c_acctbal", "cntry")
    )
    avg_bal = pool.filter(F.col("c_acctbal") > 0).agg(
        (dsum("c_acctbal", 2) / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts(Q22_CUTOFF)
    ).select("o_custkey")
    dormant = (
        pool.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
    )
    return dormant.groupBy("cntry").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum("c_acctbal", 2).alias("totacctbal"),
    )
