"""Sparse matrix-multiply queries (SURVEY.md §2.8 matmul, §2.1 scan_coo)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.linalg import matmul_coo
from ..sources.readers import scan_coo
from ..sources.tables import load_table
from .registry import register

#: Part_2.pdf p1 fixture: M=[[2,1],[6,3]], N=[[5,11],[0,1]] -> [[10,23],[30,69]].
MATMUL_FIXTURE = [
    ("M", 0, 0, 2.0), ("M", 0, 1, 1.0), ("M", 1, 0, 6.0), ("M", 1, 1, 3.0),
    ("N", 0, 0, 5.0), ("N", 0, 1, 11.0), ("N", 1, 1, 1.0),
]

_SQL_CELLS = (
    "SELECT CASE WHEN l_linenumber % 2 = 0 THEN 'M' ELSE 'N' END AS name, "
    "l_orderkey % 8 AS i, l_partkey % 8 AS j, l_quantity AS v FROM lineitem"
)


@register(
    "matmul_coo_fixture",
    oracle=(
        "WITH cells(name, i, j, v) AS (VALUES "
        + ", ".join(f"('{n}', {i}, {j}, {v})" for n, i, j, v in MATMUL_FIXTURE)
        + "), m AS (SELECT i, j, CAST(v AS DECIMAL(18,4)) AS v FROM cells WHERE name = 'M'), "
        "n AS (SELECT i, j, CAST(v AS DECIMAL(18,4)) AS v FROM cells WHERE name = 'N') "
        "SELECT m.i AS i, n.j AS j, CAST(SUM(m.v * n.v) AS DOUBLE) AS val "
        "FROM m JOIN n ON m.j = n.i GROUP BY m.i, n.j"
    ),
    doc="Part_2.pdf p1 2x2 golden matmul via the COO source (scan_coo, "
    "MRSystemSimulator2020.py:296-301).",
    tags=("scan_coo", "matmul", "join_matmul"),
)
def matmul_coo_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return matmul_coo(scan_coo(spark, MATMUL_FIXTURE))


@register(
    "matmul_lineitem",
    oracle=(
        f"WITH cells AS ({_SQL_CELLS}), "
        # Two DuckDB pitfalls found at sf0.1 (verified against exact Python
        # Decimal arithmetic; Spark's decimal path was already exact):
        # (a) SUM widens the cells to DECIMAL(38,4) and a (38,4)x(38,4)
        #     product exceeds width 38 -> silent DOUBLE fallback; the
        #     (19,4)x(18,4) downcasts force the int128 multiply (-> 37,8).
        # (b) DuckDB rewrites CAST(SUM(decimal) AS DOUBLE) into a
        #     sum-in-double (order-dependent: ...86.99998 vs exact ...87.0);
        #     the VARCHAR bridge keeps the sum decimal and converts the
        #     exact printed value, matching Spark's correctly-rounded
        #     decimal->double cast.
        "m AS (SELECT i, j, CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DECIMAL(19,4)) AS v "
        "FROM cells WHERE name = 'M' GROUP BY i, j), "
        "n AS (SELECT i, j, CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v "
        "FROM cells WHERE name = 'N' GROUP BY i, j) "
        "SELECT m.i AS i, n.j AS j, "
        "CAST(CAST(SUM(m.v * n.v) AS VARCHAR) AS DOUBLE) AS val "
        "FROM m JOIN n ON m.j = n.i GROUP BY m.i, n.j"
    ),
    doc="Distributed sparse matmul as equi-join + sum aggregation "
    "(Part_2.pdf p1 single-pass replication join, superseded per SURVEY.md §4): "
    "8x8 matrices derived from lineitem (FIXTURES.md §B).",
    tags=("matmul", "join_matmul", "agg_dotprod"),
)
def matmul_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.select(
        F.when(F.col("l_linenumber") % 2 == 0, "M").otherwise("N").alias("name"),
        (F.col("l_orderkey") % 8).alias("i"),
        (F.col("l_partkey") % 8).alias("j"),
        F.col("l_quantity").alias("v"),
    )
    return matmul_coo(cells)
