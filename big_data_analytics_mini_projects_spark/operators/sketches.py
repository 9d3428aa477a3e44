"""Deterministic approximate sketches: HLL-style distinct counting and a
Count-Min frequency sketch — the "streaming algorithms" surface generalized
beyond the reference's hash sampler (README.md:10 claims streaming algorithms;
the only realized instance is sampler_v02.py's one-pass sampler, SURVEY.md
§2.4 note). Both sketches are single-pass, fixed-memory, mergeable — the
properties that matter at 100 TB — and both are engineered to be bit-identical
across engines so they sit inside the hash-compared oracle gate:

- the hash is the cross-engine 60-bit md5 (functions/hashing.py pattern);
- HLL's harmonic sum Σ 2^-M is kept EXACT by scaling to 2^(RHO_CAP - M)
  integers (no float-accumulation order dependence);
- Count-Min is pure integer min-of-counts.

Spark's production equivalents are `approx_count_distinct` (HLL++) and
count-min via DataSketches; these hand-rolled versions exist because their
estimates are reproducible in ANSI SQL, which the built-ins' binary sketch
states are not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import round_stable

#: Trailing-zero cap = usable hash bits above the bucket index (60-bit hash).
RHO_CAP = 50


def _h64(col: Column, prefix: str) -> Column:
    """60-bit md5 hash: int(md5('{prefix}:{v}')[:15], 16) — cross-engine."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix + ":"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def sql_h64(expr: str, prefix: str) -> str:
    """DuckDB twin of :func:`_h64`."""
    return f"('0x' || substr(md5('{prefix}:' || CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant for m >= 128 buckets."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None, p: int = 9
) -> DataFrame:
    """HyperLogLog-shaped distinct-count estimate (Flajolet et al. 2007).

    bucket = h % 2^p; rho = 1 + trailing zeros of (h div 2^p) (capped at
    RHO_CAP); per-bucket register M = max(rho). The harmonic mean is computed
    over scaled integers: each register contributes 2^(RHO_CAP - M) and each
    of the (m - observed) empty buckets contributes 2^RHO_CAP, so the sum is
    an exact BIGINT — no float merge-order nondeterminism. Estimate =
    alpha * m^2 * 2^RHO_CAP / sum.

    Returns group_cols + (n_est,). Applies the standard linear-counting
    small-range correction (raw <= 2.5m and empty registers exist ->
    m*ln(m/V)): without it the raw estimator reports ~0.73m regardless of n
    when n << m. ln() is the one operation trusted to libm on both engines;
    rounding to 2 decimals absorbs last-ulp differences.

    Single pass, 2^p registers per group, mergeable by max — the shape that
    replaces COUNT(DISTINCT) when the key set itself does not fit anywhere.
    Trailing zeros via bin()+rtrim (both engines): tz = len(bin) - len(rtrim
    (bin,'0')); h div 2^p = 0 is capped explicitly.
    """
    m = 1 << p
    g = list(group_cols or [])
    h = _h64(F.col(value_col), "hll")
    rest = F.expr(f"h div {m}")
    bin_rest = F.bin(rest)
    # trailing zeros of the binary string; rest = 0 handled by the cap branch
    tz = F.length(bin_rest) - F.length(F.regexp_replace(bin_rest, "0+$", ""))
    rho = F.when(rest == 0, F.lit(RHO_CAP)).otherwise(
        F.least(tz + 1, F.lit(RHO_CAP))
    )
    regs = (
        df.select(*g, h.alias("h"))
        .select(*g, F.expr(f"h % {m}").alias("bucket"), rho.alias("rho"))
        .groupBy(*g, "bucket")
        .agg(F.max("rho").alias("M"))
    )
    scaled = F.expr(f"cast(pow(2, {RHO_CAP} - M) as bigint)")
    per_group = regs.groupBy(*g).agg(
        F.sum(scaled).alias("s_obs"), F.count(F.lit(1)).alias("n_buckets")
    )
    total = F.col("s_obs") + (F.lit(m) - F.col("n_buckets")) * F.lit(1 << RHO_CAP)
    raw = F.lit(hll_alpha(m) * m * m * float(1 << RHO_CAP)) / total.cast("double")
    zeros = F.lit(m) - F.col("n_buckets")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)
    return per_group.select(*g, round_stable(est, 2).alias("n_est"))


def sql_hll_distinct(
    source_sql: str, value_expr: str, group_exprs: list[str] | None = None, p: int = 9
) -> str:
    """DuckDB twin of :func:`hll_distinct` (same scaled-integer arithmetic)."""
    m = 1 << p
    g = list(group_exprs or [])
    gsel = (", ".join(g) + ", ") if g else ""
    gby = ("GROUP BY " + ", ".join(g)) if g else ""
    gby_regs = "GROUP BY " + ", ".join(g + ["bucket"])
    h = sql_h64(value_expr, "hll")
    return f"""
WITH hashed AS (SELECT {gsel}{h} AS h FROM ({source_sql})),
rhoed AS (SELECT {gsel}h % {m} AS bucket,
  CASE WHEN h // {m} = 0 THEN {RHO_CAP}
       ELSE least(length(bin(h // {m}))
                  - length(rtrim(bin(h // {m}), '0')) + 1, {RHO_CAP}) END AS rho
  FROM hashed),
regs AS (SELECT {gsel}bucket, MAX(rho) AS M FROM rhoed {gby_regs}),
agged AS (SELECT {gsel}SUM(CAST(pow(2, {RHO_CAP} - M) AS BIGINT)) AS s_obs,
          COUNT(*) AS n_buckets FROM regs {gby}),
ested AS (SELECT {gsel}
  CAST({hll_alpha(m) * m * m * float(1 << RHO_CAP)!r} AS DOUBLE)
    / CAST(s_obs + ({m} - n_buckets) * {1 << RHO_CAP} AS DOUBLE) AS raw,
  {m} - n_buckets AS zeros FROM agged)
SELECT {gsel}floor((CASE WHEN raw <= {2.5 * m} AND zeros > 0
        THEN CAST({float(m)!r} AS DOUBLE) * ln(CAST({float(m)!r} AS DOUBLE) / zeros)
        ELSE raw END) * 100 + 0.5) / 100 AS n_est
FROM ested
"""


def cm_sketch_counts(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch state: (seed, bucket, c) — depth hash rows x width
    buckets of exact counts over the item stream (Cormode & Muthukrishnan
    2005). One groupBy over (seed, bucket): fixed d*w memory per partition
    with map-side partials, mergeable by +."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    return (
        items.select(F.col(item_col).alias("item"))
        .select("item", seeds)
        .select(
            "seed",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("cm"),
                                F.col("seed").cast("string"),
                                F.lit(":"),
                                F.col("item").cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            ).alias("bucket"),
        )
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cm_estimate(
    sketch: DataFrame, candidates: DataFrame, item_col: str = "item",
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each candidate item: est = min over the
    depth rows of the candidate's bucket count (upper-bounds the true count,
    over-counting only from collisions). Returns candidates + (cm_est,)."""
    keyed = candidates.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cm"),
                        F.col("seed").cast("string"),
                        F.lit(":"),
                        F.col(item_col).cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width,
    )
    others = [c for c in candidates.columns]
    # LEFT join + coalesce(0): a (seed, bucket) row absent from the sketch
    # means that hash row never saw the bucket — its count is 0, and it must
    # participate in the min (an inner join would silently drop the seed, or
    # drop a never-seen candidate entirely instead of reporting cm_est = 0).
    # The sketch itself is bounded (depth x width rows), so the broadcast
    # hint is safe at any data scale.
    return (
        keyed.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(*others)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cm_est"))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Mergeable histogram-quantile sketch: one pass bins values into
    ``n_bins`` uniform buckets over [lo, hi); quantile q(p) is the upper edge
    of the first bin whose cumulative count reaches ceil(p*n) — a
    deterministic upper bound with error <= one bin width.

    This is the fixed-memory complement to the exact rank-based quantiles
    (plans/relationalx.py): bin counts are integers that merge by addition
    across partitions/shards/days, so the same sketch state serves rolling
    corpus percentiles at 100 TB where a global sort-rank pass is a job of
    its own. The only non-map-side step is the cumulative sum over the BIN
    table — bounded at n_bins rows regardless of data size (that bound is
    the entire point of the sketch; the data itself is never windowed).

    Returns (p, bin, n_le, est) — probability, chosen bin, cumulative count
    at that bin, and the value estimate.
    """
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("long")
    counts = df.select(b.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Grand total via an unbounded frame over the SAME bounded bin table the
    # cumulative sum already windows — no join at all (a broadcast cross join
    # of the 1-row total would add a BroadcastNestedLoopJoin for nothing).
    # The single-partition window is safe here: the input is the sketch state
    # itself, bounded at n_bins rows regardless of data size.
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = counts.withColumn("n_le", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(w_all)
    )
    targets = F.explode(
        F.array(*[F.lit(float(p)) for p in probs])
    ).alias("p")
    hits = cum.select("bin", "n_le", targets, "n").filter(
        F.col("n_le") >= F.ceil(F.col("p") * F.col("n"))
    )
    best = hits.groupBy("p").agg(
        F.min(F.struct("bin", "n_le")).alias("s")
    )
    return best.select(
        "p",
        F.col("s.bin").alias("bin"),
        F.col("s.n_le").alias("n_le"),
        round_stable(F.lit(lo) + (F.col("s.bin") + 1) * F.lit(width)).alias("est"),
    )
