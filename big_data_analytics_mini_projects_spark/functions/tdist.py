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


# ---------------------------------------------------------------------------
# O(1)-in-df variant (round-4 verdict item 5): two-sided p via the regularized
# incomplete beta I_x(ν/2, 1/2), x = ν/(ν+t²), evaluated with the modified-
# Lentz continued fraction at a FIXED 200 half-steps (Numerical Recipes betacf
# convergence is < 100 half-steps everywhere on this domain; fixed-count keeps
# the two engines' operation sequences literally identical — no early-exit
# predicate that a 1-ulp difference could flip). ln Γ comes from the Lanczos
# g=7 series with the same 9 literal constants in both engines. Agreement vs
# the A&S series path: < 1e-9 absolute on df ∈ [1, 1e6]; cross-engine
# agreement ~1e-15 (libm ln/exp ulp only) — both far inside the declared
# query's 6-decimal stable rounding. Unlike the series/recursive-CTE pair,
# cost is independent of df: the oracle stays cheap at any SF.
# ---------------------------------------------------------------------------

#: Lanczos g=7 coefficients — spelled with full precision, identically, in the
#: Spark expressions and the DuckDB SQL below. Each is wrapped as
#: CAST('<digits>' AS DOUBLE) (valid in both dialects): a BARE 17-digit
#: numeric literal parses into DECIMAL in DuckDB, and its decimal->double
#: conversion lands 1 ulp off the true nearest double for two of these
#: constants (0.9189385332046727, 12.507343278686905) while Spark parses
#: them exactly — a measured cross-engine divergence inside the p-value
#: pipeline that the 6-decimal rounding merely happened to absorb. The
#: string-parse path is correctly rounded in both engines.


def _dlit(digits: str) -> str:
    return f"CAST('{digits}' AS DOUBLE)"


_LANCZOS = tuple(
    _dlit(c)
    for c in (
        "0.99999999999980993", "676.5203681218851", "-1259.1392167224028",
        "771.32342877765313", "-176.61502916214059", "12.507343278686905",
        "-0.13857109526572012", "0.0000099843695780195716",
        "0.00000015056327351493116",
    )
)
_LG_HALF = _dlit("0.5723649429247001")  # lgamma(0.5) as an IEEE double
_LN_SQRT_2PI = _dlit("0.9189385332046727")
_CF_STEPS = 200  # 2*M half-steps, M=100 full Lentz iterations


def _lanczos_lgamma(z: str) -> str:
    """ln Γ(z) for z > 0 as a plain SQL expression (valid in BOTH dialects:
    arithmetic, ln, and a flat 8-term sum only)."""
    series = " + ".join(
        f"{c} / (({z}) - 1 + {i})" for i, c in enumerate(_LANCZOS[1:], start=1)
    )
    return (
        f"({_LN_SQRT_2PI} + (({z}) - 0.5) * ln(({z}) + 6.5) - (({z}) + 6.5) "
        f"+ ln({_LANCZOS[0]} + {series}))"
    )


def _cf_guard(v: str) -> str:
    """Lentz tiny-denominator guard, same literal in both engines."""
    return f"(CASE WHEN abs({v}) < 1e-30 THEN 1e-30 ELSE {v} END)"


def _cf_aa(ca: str, cb: str, cx: str, j: str, md: str) -> str:
    """Half-step numerator a_m of the betacf recurrence at fold index j
    (odd j -> the m(b-m) term, even j -> the -(a+m)(a+b+m) term)."""
    return (
        f"(CASE WHEN ({j}) % 2 = 1 "
        f"THEN ({md}) * (({cb}) - ({md})) * ({cx}) "
        f"/ ((({ca}) - 1 + 2 * ({md})) * (({ca}) + 2 * ({md}))) "
        f"ELSE -((({ca}) + ({md})) * (({ca}) + ({cb}) + ({md})) * ({cx})) "
        f"/ ((({ca}) + 2 * ({md})) * (({ca}) + 1 + 2 * ({md}))) END)"
    )


_TC_COLS = ("_tc_t", "_tc_dfd", "_tc_x", "_tc_u", "_tc_a", "_tc_sw",
            "_tc_ca", "_tc_cb", "_tc_cx", "_tc_lnbt", "_tc_h")


def with_two_sided_t_pvalue_cf(
    frame: DataFrame, t_col: str, df_col: Column, out: str = "p_value"
) -> DataFrame:
    """Append ``out`` = 2·P(T > |t_col|) via the fixed-iteration incomplete-
    beta continued fraction — O(1) in df per row. Mirrored operation for
    operation by :func:`sql_t_pvalue_cf_ctes`."""
    aa = _cf_aa("_tc_ca", "_tc_cb", "_tc_cx", "j", "cast((j + 1) div 2 as double)")
    d_new = f"(1.0D / {_cf_guard(f'1.0D + {aa} * st.d')})"
    c_new = _cf_guard(f"1.0D + {aa} / st.c")
    d0 = f"(1.0D / {_cf_guard('1.0D - (_tc_ca + _tc_cb) * _tc_cx / (_tc_ca + 1.0D)')})"
    fold = f"""aggregate(
      sequence(1, {_CF_STEPS}),
      named_struct('c', 1.0D, 'd', {d0}, 'h', {d0}),
      (st, j) -> named_struct(
        'c', {c_new},
        'd', {d_new},
        'h', st.h * {d_new} * {c_new}),
      st -> st.h)"""
    f = (
        frame.withColumn("_tc_t", F.abs(F.col(t_col)))
        .withColumn("_tc_dfd", df_col.cast("long").cast("double"))
        .withColumn(
            "_tc_x", F.col("_tc_dfd") / (F.col("_tc_dfd") + F.col("_tc_t") * F.col("_tc_t"))
        )
        .withColumn(
            "_tc_u",
            (F.col("_tc_t") * F.col("_tc_t"))
            / (F.col("_tc_dfd") + F.col("_tc_t") * F.col("_tc_t")),
        )
        .withColumn("_tc_a", F.col("_tc_dfd") / F.lit(2.0))
        .withColumn(
            "_tc_sw", F.col("_tc_x") < (F.col("_tc_a") + 1.0) / (F.col("_tc_a") + 2.5)
        )
        .withColumn("_tc_ca", F.when(F.col("_tc_sw"), F.col("_tc_a")).otherwise(F.lit(0.5)))
        .withColumn("_tc_cb", F.when(F.col("_tc_sw"), F.lit(0.5)).otherwise(F.col("_tc_a")))
        .withColumn(
            "_tc_cx", F.when(F.col("_tc_sw"), F.col("_tc_x")).otherwise(F.col("_tc_u"))
        )
        .withColumn(
            "_tc_lnbt",
            # ln args guarded against the t=0 / x=1 edge (the final CASE
            # returns 1.0 there, but DuckDB evaluates its CTE column eagerly
            # and ln(0) RAISES there rather than returning -inf — guard both
            # engines identically so the unused value is finite).
            F.expr(
                f"{_lanczos_lgamma('_tc_a + 0.5')} - {_lanczos_lgamma('_tc_a')} "
                f"- {_LG_HALF} + _tc_a * ln(CASE WHEN _tc_x <= 0 THEN 1 ELSE _tc_x END) "
                f"+ 0.5 * ln(CASE WHEN _tc_u <= 0 THEN 1 ELSE _tc_u END)"
            ),
        )
        .withColumn("_tc_h", F.expr(fold))
    )
    bt_over_ca = F.exp(F.col("_tc_lnbt")) * F.col("_tc_h") / F.col("_tc_ca")
    p = (
        F.when((F.col("_tc_u") <= 0) | (F.col("_tc_x") >= 1), F.lit(1.0))
        .when(F.col("_tc_sw"), bt_over_ca)
        .otherwise(F.lit(1.0) - bt_over_ca)
    )
    return f.withColumn(out, p).drop(*_TC_COLS)


def sql_t_pvalue_cf_ctes(src: str, t_col: str, df_sql: str, key: str) -> str:
    """DuckDB twin of :func:`with_two_sided_t_pvalue_cf`: the same Lanczos
    constants, the same Lentz half-step sequence (a bounded {0..N} recursive
    CTE — O(1) in df, unlike the series CTE), the same guards. Defines
    ``<src>_p`` = all columns of ``<src>`` plus ``p_value``. Splice into a
    ``WITH RECURSIVE`` clause."""
    aa = _cf_aa("b.tc_ca", "b.tc_cb", "b.tc_cx", "s.j + 1", "CAST((s.j + 2) // 2 AS DOUBLE)")
    d_new = f"(1.0 / {_cf_guard(f'1.0 + {aa} * s.d')})"
    c_new = _cf_guard(f"1.0 + {aa} / s.c")
    d0 = f"(1.0 / {_cf_guard('1.0 - (tc_ca + tc_cb) * tc_cx / (tc_ca + 1.0)')})"
    return f"""
cfb AS (
  SELECT *, abs({t_col}) AS tc_t,
         CAST(CAST({df_sql} AS BIGINT) AS DOUBLE) AS tc_dfd
  FROM {src}),
cfb2 AS (
  SELECT *, tc_dfd / (tc_dfd + tc_t * tc_t) AS tc_x,
         (tc_t * tc_t) / (tc_dfd + tc_t * tc_t) AS tc_u,
         tc_dfd / 2.0 AS tc_a
  FROM cfb),
cfb3 AS (
  SELECT *, tc_x < (tc_a + 1.0) / (tc_a + 2.5) AS tc_sw FROM cfb2),
cfb4 AS (
  SELECT *,
         CASE WHEN tc_sw THEN tc_a ELSE 0.5 END AS tc_ca,
         CASE WHEN tc_sw THEN 0.5 ELSE tc_a END AS tc_cb,
         CASE WHEN tc_sw THEN tc_x ELSE tc_u END AS tc_cx,
         {_lanczos_lgamma('tc_a + 0.5')} - {_lanczos_lgamma('tc_a')}
           - {_LG_HALF} + tc_a * ln(CASE WHEN tc_x <= 0 THEN 1 ELSE tc_x END)
           + 0.5 * ln(CASE WHEN tc_u <= 0 THEN 1 ELSE tc_u END) AS tc_lnbt
  FROM cfb3),
cfser(tc_k, j, c, d, h) AS (
  -- c's base case MUST be cast: a bare 1.0 is DECIMAL(2,1) in DuckDB and
  -- the recursive CTE pins the column type from the base row — every later
  -- c would silently round to one decimal place.
  SELECT {key}, 0, CAST(1.0 AS DOUBLE), {d0}, {d0} FROM cfb4
  UNION ALL
  SELECT s.tc_k, s.j + 1, {c_new}, {d_new}, s.h * {d_new} * {c_new}
  FROM cfser s JOIN cfb4 b ON s.tc_k = b.{key} WHERE s.j < {_CF_STEPS}),
cfh AS (SELECT tc_k, h FROM cfser WHERE j = {_CF_STEPS}),
{src}_p AS (
  SELECT b.* EXCLUDE (tc_t, tc_dfd, tc_x, tc_u, tc_a, tc_sw, tc_ca, tc_cb,
                      tc_cx, tc_lnbt),
         CASE WHEN b.tc_u <= 0 OR b.tc_x >= 1 THEN 1.0
              WHEN b.tc_sw THEN exp(b.tc_lnbt) * f.h / b.tc_ca
              ELSE 1.0 - exp(b.tc_lnbt) * f.h / b.tc_ca END AS p_value
  FROM cfb4 b JOIN cfh f ON b.{key} = f.tc_k)
"""


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
