"""TPC-H Q6/Q14/Q19 shapes — round-4 additions widening the relational
benchmark surface (SURVEY.md §2.3-2.5 join/filter/agg operators composed into
three classic plans the catalog did not yet cover; Q1/Q3/Q4/Q5/Q13/Q18 live
in core/decisionq/relationalx):

- Q6: pure scan -> tight range filters -> global agg — the predicate-pushdown
  showcase (every filter reaches the parquet scan, no shuffle at all until
  the single-row partial-agg exchange);
- Q14: two conditional decimal sums over a fact⋈dimension join folded into
  one ratio — the map-side-combine + broadcast showcase;
- Q19: disjunctive OR-of-ANDs predicates straddling the lineitem⋈part join —
  the optimizer must split each disjunct into its pushable per-side parts
  (brand/size to the part scan, quantity to the lineitem scan via the
  OR-envelope) and keep the cross-side conjunctions as a residual condition.

Scale notes: Q6 is one pass, no shuffle. Q14/Q19's part side broadcasts under
AQE at any realistic dimension/fact ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import round_stable, sql_round_stable
from ..operators.aggregates import dsum, sql_dsum
from ..operators.relational import join_auto
from ..sources.tables import load_table
from .registry import register

Q6_LO = "1996-01-01 00:00:00"
Q6_HI = "1997-01-01 00:00:00"
Q14_LO = "1996-09-01 00:00:00"
Q14_HI = "1996-10-01 00:00:00"


@register(
    "tpch_q6_forecast_revenue",
    oracle=(
        f"SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue, "
        "COUNT(*) AS n_lines FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{Q6_LO}' "
        f"AND l_shipdate < TIMESTAMP '{Q6_HI}' "
        "AND l_discount >= 0.05 AND l_discount <= 0.07 "
        "AND l_quantity < 24"
    ),
    doc="TPC-H Q6 shape: forecast revenue change — scan, three tight range "
    "predicates (all pushed to the parquet scan: date, discount band, "
    "quantity cap), one global decimal sum. No join, no groupBy key: the "
    "only exchange is the single-row final aggregate. The double literals "
    "compare identically in both engines because the stored discounts and "
    "the literals round to the same nearest-double.",
    tags=("filter_pred", "agg_combiner", "scan_pushdown"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q6_LO).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(Q6_HI).cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q14_PROMO = sql_dsum("CASE WHEN p_type = 'PROMO' THEN disc ELSE 0 END", 4)
_Q14_TOTAL = sql_dsum("disc", 4)


@register(
    "tpch_q14_promo_revenue",
    oracle=(
        "WITH j AS (SELECT p_type, l_extendedprice * (1 - l_discount) AS disc "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        f"WHERE l_shipdate >= TIMESTAMP '{Q14_LO}' "
        f"AND l_shipdate < TIMESTAMP '{Q14_HI}') "
        f"SELECT {_Q14_PROMO} AS promo_revenue, "
        f"{_Q14_TOTAL} AS total_revenue, "
        + sql_round_stable(f"100.0 * {_Q14_PROMO} / {_Q14_TOTAL}")
        + " AS promo_pct FROM j"
    ),
    doc="TPC-H Q14 shape: promotion revenue share for one ship month — "
    "fact⋈part join (AQE broadcast at dimension/fact ratios), two "
    "conditional exact-decimal sums folded map-side, ratio rounded "
    "binary-stably for the cross-engine hash.",
    tags=("join_broadcast", "agg_combiner", "filter_pred"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q14_HI).cast("timestamp_ntz"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = join_auto(li, part, li.l_partkey == part.p_partkey).select(
        "p_type",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc"),
    )
    promo = dsum(F.when(F.col("p_type") == "PROMO", F.col("disc")).otherwise(F.lit(0)), 4)
    total = dsum("disc", 4)
    return j.agg(
        promo.alias("promo_revenue"),
        total.alias("total_revenue"),
        round_stable(
            F.lit(100.0) * promo.cast("double") / total.cast("double")
        ).alias("promo_pct"),
    )


_Q19_DISJUNCTS_SQL = (
    "((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 "
    "AND l_quantity BETWEEN 1 AND 11) "
    "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 "
    "AND l_quantity BETWEEN 10 AND 20) "
    "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 "
    "AND l_quantity BETWEEN 20 AND 30))"
)


@register(
    "tpch_q19_discounted_revenue",
    oracle=(
        f"SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue, "
        "COUNT(*) AS n_lines "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        f"WHERE {_Q19_DISJUNCTS_SQL}"
    ),
    doc="TPC-H Q19 shape: disjunctive OR-of-ANDs predicate straddling the "
    "lineitem⋈part join. Catalyst splits each disjunct into its pushable "
    "per-side envelope (brand/size disjunction to the part scan, the "
    "quantity OR-envelope to the lineitem scan) and evaluates the full "
    "cross-side disjunction as the join's residual condition — the classic "
    "test that OR predicates don't force a cartesian or a post-join filter "
    "of unpushed scans.",
    tags=("join_broadcast", "filter_pred", "agg_combiner"),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    d1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    d2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    d3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    j = join_auto(li, part, (li.l_partkey == part.p_partkey) & (d1 | d2 | d3))
    return j.agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
