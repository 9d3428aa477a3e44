"""Aggregation operators (SURVEY.md §2.4).

All are built-in Spark aggregates: partial (map-side) + final HashAggregate is
automatic, which is exactly the "combiner" the reference implements by hand
(MRSystemSimulator2020.py:66-96). Population σ everywhere — the reference code
divides by n (MRSystemSimulator2020.py:244, sampler_v02.py:56,87), not n-1.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import round_stable


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact (decimal) sum of a double column, returned as double.

    Float sums depend on partition merge order — nondeterministic across
    engines AND across runs. Casting each addend to decimal first makes the
    sum exact and therefore bit-stable everywhere, at the cost of one cast:
    the pattern every differential-tested money aggregate here uses.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum`.

    The VARCHAR bridge (decimal -> text -> double) is load-bearing: DuckDB's
    direct ``CAST(SUM(decimal) AS DOUBLE)`` is 1 ulp off the correctly-rounded
    value once the scaled integer exceeds 2^53 (measured at the 10x rehearsal
    SF: tpch_q1 sum_charge 27864155010.94159 vs ...93), and DuckDB may also
    rewrite the direct cast into an order-dependent sum-in-double (see
    plans/linalgq.py matmul oracle note). Printing the exact decimal and
    re-parsing uses strtod, which is correctly rounded — matching Spark's
    BigDecimal.doubleValue path bit-for-bit at every magnitude.
    """
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS VARCHAR) AS DOUBLE)"


def count_by_key(df: DataFrame, keys: Sequence[str], out: str = "cnt") -> DataFrame:
    """Word-count shape: sum of 1s per key (MRSystemSimulator2020.py:183-194)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))


def mean_std_chars(
    df_chars: DataFrame, doc_count: int, ch: str = "ch", key: str = "doc_id"
) -> DataFrame:
    """Per-character mean + population σ across documents, densified over the
    alphabet (MRSystemSimulator2020.py:216-245; worked example in Assignment 1
    Description.htm:38).

    The reference materializes per-doc char histograms with explicit zeros for
    all 26 letters, then merges (Σx, Σx², n) triples associatively. Densify-
    then-aggregate is O(docs×26) rows; instead we aggregate sufficient
    statistics over only the *present* (doc, char) pairs and fold the zero
    docs in arithmetically: mean = Σx/N, σ = sqrt(Σx²/N - mean²) with N = total
    docs. Integer Σx/Σx² make both engines bit-exact before the final float ops.
    """
    per_doc = df_chars.groupBy(key, ch).agg(F.count(F.lit(1)).alias("c"))
    n = F.lit(doc_count).cast("double")
    return (
        per_doc.groupBy(ch)
        .agg(F.sum("c").alias("s1"), F.sum(F.col("c") * F.col("c")).alias("s2"))
        .select(
            F.col(ch),
            # round_stable, not F.round: s1/s2 are exact integers so the
            # quotients are bit-identical across engines — the stable form
            # keeps the .xxxx5 half-case rounding identical too.
            round_stable(F.col("s1") / n).alias("mean"),
            round_stable(
                F.sqrt(F.col("s2") / n - (F.col("s1") / n) * (F.col("s1") / n))
            ).alias("std"),
        )
    )


def welford_stats(df: DataFrame, value_col: str, round_to: int = 4) -> DataFrame:
    """Global streaming-equivalent (count, mean, population σ) triple.

    The reference accumulates Welford's (n, mean, M2) one row at a time
    (sampler_v02.py:50-56,81-87). Spark's avg/stddev_pop aggregate the same
    sufficient statistics tree-wise (partial per partition, merged), which is
    Welford generalized to parallel merges — the streaming flavor lives in
    streaming/stream_stats.py and produces identical numbers.
    """
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        round_stable(F.avg(value_col), round_to).alias("mean"),
        round_stable(F.stddev_pop(value_col), round_to).alias("std"),
    )
