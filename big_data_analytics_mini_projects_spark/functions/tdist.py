"""Closed-form two-sided Student-t p-value for INTEGER degrees of freedom,
as native SQL expressions in both engines — no Python in the plan.

Math (Abramowitz & Stegun 26.7.3/26.7.4, elementary-function expansion of
the t CDF at integer df): with x = |t|, ν = df, θ = atan(x/√ν),
cos²θ = ν/(ν + x²), sinθ = x/√(ν + x²),

  A(x|ν) = P(|T| ≤ x)
         = (2/π)·(θ + sinθ·S)          ν odd   (S empty for ν = 1)
         = sinθ·S                      ν even

where S is the finite sum of m = ν div 2 terms built by the recurrence

  ν odd : T₁ = cosθ,  T_{j+1} = T_j · cos²θ · (2j)/(2j+1)
  ν even: T₁ = 1,     T_{j+1} = T_j · cos²θ · (2j-1)/(2j)

and the two-sided p-value is 1 − A. The reference computes the same number
via scipy.stats.t.sf (a3_p1.py:94,129).

Engineering: the sum is a sequential fold — Spark `aggregate(sequence(1,
m-1), struct(term, acc), ...)` inside whole-stage codegen — and the DuckDB
oracle (``sql_t_pvalue_ctes``) runs the IDENTICAL recurrence as a recursive
CTE, same operation order, so the engines agree to ~1e-15 absolute (libm
ulp differences in atan/sin/sqrt only) — far inside the 6-decimal rounding
of the declared query. All shared subexpressions (cos²θ, sinθ, θ) are
materialized as real columns BEFORE the fold: expressions inlined into a
higher-order-function lambda are re-evaluated once per fold step (the
O(len²) trap documented for the trigram pipeline).

Scale note: the fold is O(ν) per row, applied AFTER aggregation, so rows =
K groups (bounded — e.g. the top-1000 words) while ν = the per-group
observation count. Exact and fast for ν up to ~1e5; for corpus-scale ν
prefer the vectorized pandas-UDF continued fraction
(operators/stats._two_sided_p, O(1) in ν) — the default
``p_method="udf"`` of ols_simple_closed. The declared differential query
uses THIS path because it is oracle-checkable; the UDF is not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Per-step multiplier at fold index j (see recurrence above). Kept as one
# string constant so the Spark lambda's two uses cannot drift apart.
_RATIO_SPARK = (
    "(CASE WHEN _tp_odd THEN (2.0D * j) / (2.0D * j + 1.0D) "
    "ELSE (2.0D * j - 1.0D) / (2.0D * j) END)"
)

_SUM_SPARK = f"""CASE
  WHEN _tp_m >= 2 THEN aggregate(
    sequence(1, cast(_tp_m - 1 as int)),
    named_struct('term', _tp_t0, 'acc', _tp_t0),
    (st, j) -> named_struct(
      'term', st.term * _tp_c2 * {_RATIO_SPARK},
      'acc',  st.acc + st.term * _tp_c2 * {_RATIO_SPARK}),
    st -> st.acc)
  WHEN _tp_m = 1 THEN _tp_t0
  ELSE 0.0D END"""

_TEMP_COLS = ("_tp_df", "_tp_dfd", "_tp_at", "_tp_odd", "_tp_m", "_tp_c2",
              "_tp_sin", "_tp_th", "_tp_t0", "_tp_s")


def with_two_sided_t_pvalue(
    frame: DataFrame, t_col: str, df_col: Column, out: str = "p_value"
) -> DataFrame:
    """Append ``out`` = 2·P(T > |t_col|) at integer df ``df_col``.

    NaN t propagates to NaN p (matching the UDF path); callers filter
    degenerate fits (|r| = 1, zero variance) before or after — the declared
    queries filter on beta in both engines identically.
    """
    at = F.abs(F.col(t_col))
    f = (
        frame.withColumn("_tp_df", df_col.cast("long"))
        .withColumn("_tp_dfd", F.col("_tp_df").cast("double"))
        .withColumn("_tp_at", at)
        .withColumn("_tp_odd", F.pmod(F.col("_tp_df"), F.lit(2)) == 1)
        .withColumn("_tp_m", F.expr("_tp_df div 2"))
        .withColumn(
            "_tp_c2",
            F.col("_tp_dfd") / (F.col("_tp_dfd") + F.col("_tp_at") * F.col("_tp_at")),
        )
        .withColumn(
            "_tp_sin",
            F.col("_tp_at") / F.sqrt(F.col("_tp_dfd") + F.col("_tp_at") * F.col("_tp_at")),
        )
        .withColumn("_tp_th", F.atan(F.col("_tp_at") / F.sqrt(F.col("_tp_dfd"))))
        .withColumn("_tp_t0", F.when(F.col("_tp_odd"), F.sqrt(F.col("_tp_c2"))).otherwise(F.lit(1.0)))
        .withColumn("_tp_s", F.expr(_SUM_SPARK))
    )
    p = F.when(
        F.col("_tp_odd"),
        F.lit(1.0)
        - (F.lit(2.0) / F.expr("pi()")) * (F.col("_tp_th") + F.col("_tp_sin") * F.col("_tp_s")),
    ).otherwise(F.lit(1.0) - F.col("_tp_sin") * F.col("_tp_s"))
    return f.withColumn(out, p).drop(*_TEMP_COLS)


def sql_t_pvalue_ctes(src: str, t_col: str, df_sql: str, key: str) -> str:
    """DuckDB CTE chain mirroring :func:`with_two_sided_t_pvalue` operation
    for operation. Splice into a ``WITH RECURSIVE`` clause; defines
    ``<src>_p`` = all columns of ``<src>`` plus ``p_value``.

    ``df_sql`` is an integer-valued SQL expression over ``src`` columns
    (e.g. ``n - 2``); ``key`` is a unique row key of ``src``.
    """
    ratio = (
        "(CASE WHEN b.tp_odd THEN (2.0*s.j)/(2.0*s.j+1.0) "
        "ELSE (2.0*s.j-1.0)/(2.0*s.j) END)"
    )
    return f"""
tpbase AS (
  SELECT *, CAST({df_sql} AS BIGINT) AS tp_df,
         CAST(CAST({df_sql} AS BIGINT) AS DOUBLE) AS tp_dfd,
         abs({t_col}) AS tp_at
  FROM {src}),
tpb2 AS (
  SELECT *, tp_df % 2 = 1 AS tp_odd, tp_df // 2 AS tp_m,
         tp_dfd / (tp_dfd + tp_at * tp_at) AS tp_c2,
         tp_at / sqrt(tp_dfd + tp_at * tp_at) AS tp_sin,
         atan(tp_at / sqrt(tp_dfd)) AS tp_th
  FROM tpbase),
tpb3 AS (
  SELECT *, CASE WHEN tp_odd THEN sqrt(tp_c2) ELSE 1.0 END AS tp_t0 FROM tpb2),
tpser(tp_k, j, term, acc) AS (
  SELECT {key}, 1, tp_t0, tp_t0 FROM tpb3 WHERE tp_m >= 1
  UNION ALL
  SELECT s.tp_k, s.j + 1,
         s.term * b.tp_c2 * {ratio},
         s.acc + s.term * b.tp_c2 * {ratio}
  FROM tpser s JOIN tpb3 b ON s.tp_k = b.{key} WHERE s.j < b.tp_m),
tpsum AS (
  SELECT b.{key} AS tp_k, COALESCE(f.acc, 0.0) AS tp_s
  FROM tpb3 b LEFT JOIN (
    SELECT s.tp_k, s.acc FROM tpser s JOIN tpb3 b2 ON s.tp_k = b2.{key} AND s.j = b2.tp_m
  ) f ON b.{key} = f.tp_k),
{src}_p AS (
  SELECT b.* EXCLUDE (tp_df, tp_dfd, tp_at, tp_odd, tp_m, tp_c2, tp_sin, tp_th, tp_t0),
         CASE WHEN b.tp_odd THEN 1.0 - (2.0/pi()) * (b.tp_th + b.tp_sin * t.tp_s)
              ELSE 1.0 - b.tp_sin * t.tp_s END AS p_value
  FROM tpb3 b JOIN tpsum t ON b.{key} = t.tp_k)
"""
