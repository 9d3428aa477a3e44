"""Cross-module query-plan helpers with NO @register side effects.

plans/catalog.py relies on import order to control driver-window registration
order; any helper shared between two plan modules must live here (registration-
free) so importing it cannot drag a whole module's queries forward in the
catalog (the round-3 bug: recommendq importing plans.core pulled core's 11
queries into window positions 10-20).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.relational import last_per_key
from ..sources.tables import load_table

#: Synthetic ratings derivation (FIXTURES.md §B): lineitem⋈orders gives
#: (user=o_custkey, item=l_partkey, rating∈1..5, recency=l_shipdate).
#: floor before cast — DuckDB rounds double->int casts, Spark truncates.
RATING_EXPR = "1 + (CAST(floor(l_extendedprice * 100) AS BIGINT) % 5)"

SQL_RATINGS_DEDUP = f"""
SELECT user_id, item, rating FROM (
  SELECT o_custkey AS user_id, l_partkey AS item, {RATING_EXPR} AS rating,
         row_number() OVER (PARTITION BY o_custkey, l_partkey
                            ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
WHERE rn = 1
"""


def ratings_deduped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-recent rating per (user, item) — agg_last_per_key (a3_p2.py:18-22,
    spec'd 'most recent' semantics per SURVEY.md §7.4 wart #4)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    raw = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("user_id"),
        F.col("l_partkey").alias("item"),
        F.expr(RATING_EXPR).alias("rating"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    return last_per_key(
        raw,
        ["user_id", "item"],
        [F.desc("l_shipdate"), F.desc("l_orderkey"), F.desc("l_linenumber")],
    ).select("user_id", "item", "rating")


#: Scratch root for derived ingestion fixtures. Spark itself spills to the
#: system temp dir, so that is the one location guaranteed writable here.
SCRATCH = os.path.join(tempfile.gettempdir(), "bdamp_spark_scratch")


def scratch_path(name: str, sf_dir: str) -> str:
    tag = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    return os.path.join(SCRATCH, tag, name)


def reset_scratch(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(os.path.dirname(path), exist_ok=True)
