"""Item-item collaborative filtering (SURVEY.md §2.8 cf_sim / cf_predict).

Reference: a3_p2.py — centered-cosine item similarity vs broadcast target
vectors (:37-49), weighted-average prediction (:52-65), with a driver loop
re-executing the lineage per query item (:68-76). The engine computes all
target items in ONE DAG via a self-join on user.

Exact semantics preserved from the reference code:
- items filtered to >=25 distinct users, then users to >=5 distinct items
  (:24-31; item support is NOT re-filtered after the user filter, matching
  the reference's one-way cascade);
- each item vector is centered by its own mean over its FULL (filtered)
  support (:42-43,70-71); the cosine numerator runs over the user
  intersection, the norms over full support (:44-48);
- candidate pairs need >=2 common users (:40), similarities must be > 0 (:73);
- prediction = Σ r_ui·sim_i / Σ sim_i over the user's rated items that have a
  similarity (target included — its self-similarity is 1.0 in the reference's
  map); users need >=2 overlap; a user who rated the target gets the actual
  rating passed through (:52-65,76).

Determinism engineering: the cosine is expanded into *integer* sufficient
statistics (Σr, Σr², Σr_a·r_b, counts — exact in any engine) combined by one
fixed scalar expression, so Spark and DuckDB produce bit-identical doubles
(SURVEY.md §7.4 nondeterminism trap). For prediction the similarity weights
are quantized to 4 decimals (scaled integers) so the weighted sums are exact
integer arithmetic; the unquantized variant is available for parity tests.

Scale notes: the user self-join is the classic skew hazard (power users);
AQE skew-join handles moderate skew, and the pair aggregation is a single
shuffle on (item_a, item_b). Target restriction pushes into the left side
*before* the join, so a narrow query touches a fraction of the pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.text import round_stable


def cf_filter_ratings(
    ratings: DataFrame, min_users_per_item: int = 25, min_items_per_user: int = 5
) -> DataFrame:
    """Support filters (a3_p2.py:24-31). `ratings` must be (user,item)-unique
    (apply operators.relational.last_per_key first), so plain counts are
    distinct counts."""
    item_ok = (
        ratings.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_users_per_item).select("item")
    )
    r1 = ratings.join(item_ok, "item", "left_semi")
    user_ok = (
        r1.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_items_per_user).select("user_id")
    )
    return r1.join(user_ok, "user_id", "left_semi")


def _mean(s: Column, n: Column) -> Column:
    return s.cast("double") / n


def cf_item_similarities(
    rf: DataFrame,
    target_pred: Column | None = None,
    min_common: int = 2,
    salt_blocks: int | None = None,
    salt_min_ratings: int = 16,
) -> DataFrame:
    """All (target_item, item) centered-cosine similarities > 0.

    ``target_pred`` restricts the left (target) side, e.g.
    ``F.col('item') % 50 == 0``; None computes all pairs (including self-pairs,
    whose similarity is exactly 1 — kept, as in the reference's map).
    Returns (item_a, item_b, nc, sim).

    ``salt_blocks=G`` turns on block-decomposed skew handling for the user
    self-join — the classic CF scale hazard (one power user with d ratings
    pins d^2 pair-rows on a single reducer). Users with >= ``salt_min_ratings``
    ratings get their pair space split into a G x G block grid: the a-side
    carries its own block id ga = hash(item) % G and replicates over all gb,
    the b-side the mirror, and the join key becomes (user, ga, gb) — so a hot
    user's pairs land on G^2 shuffle partitions instead of one, at the cost
    of replicating only the hot users' rows G times. Cold users join on the
    plain key. Results are bit-identical to the unsalted path (the block id
    never reaches the aggregation). ``None`` (default) = plain self-join,
    which AQE skew-split already handles for moderate skew.
    """
    st = rf.groupBy("item").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rating").alias("s"),
        F.sum(F.col("rating") * F.col("rating")).alias("q"),
    )
    a = rf.select(
        F.col("user_id"), F.col("item").alias("item_a"), F.col("rating").alias("ra")
    )
    if target_pred is not None:
        a = a.filter(target_pred)
    b = rf.select(
        F.col("user_id"), F.col("item").alias("item_b"), F.col("rating").alias("rb")
    )
    if salt_blocks is not None and salt_blocks > 1:
        G = salt_blocks
        hot = (
            rf.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= salt_min_ratings).select("user_id")
        )  # unhinted: hot-user count is data-dependent; AQE picks the strategy
        blks = F.sequence(F.lit(0), F.lit(G - 1))
        a_hot = (
            a.join(hot, "user_id", "left_semi")
            .withColumn("ga", F.pmod(F.xxhash64("item_a"), F.lit(G)))
            .withColumn("gb", F.explode(blks))
        )
        b_hot = (
            b.join(hot, "user_id", "left_semi")
            .withColumn("gb", F.pmod(F.xxhash64("item_b"), F.lit(G)))
            .withColumn("ga", F.explode(blks))
        )
        joined = (
            a.join(hot, "user_id", "left_anti")
            .join(b.join(hot, "user_id", "left_anti"), "user_id")
            .select("user_id", "item_a", "ra", "item_b", "rb")
            .unionAll(
                a_hot.join(b_hot, ["user_id", "ga", "gb"])
                .select("user_id", "item_a", "ra", "item_b", "rb")
            )
        )
    else:
        joined = a.join(b, "user_id")
    pairs = joined.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum(F.col("ra") * F.col("rb")).alias("p"),
        F.sum("ra").alias("sa"),
        F.sum("rb").alias("sb"),
    )
    sta = st.select(
        F.col("item").alias("item_a"), F.col("n").alias("na"),
        F.col("s").alias("sfa"), F.col("q").alias("qa"),
    )
    stb = st.select(
        F.col("item").alias("item_b"), F.col("n").alias("nb"),
        F.col("s").alias("sfb"), F.col("q").alias("qb"),
    )
    # per-item stats grow with the catalog — unhinted, AQE decides (broadcast
    # while small, shuffled hash join at catalog scale)
    j = pairs.join(sta, "item_a").join(stb, "item_b")
    ma = _mean(F.col("sfa"), F.col("na"))
    mb = _mean(F.col("sfb"), F.col("nb"))
    # Expression structure mirrored 1:1 in the SQL oracle — keep in sync.
    num = (
        F.col("p") - ma * F.col("sb") - mb * F.col("sa") + F.col("nc") * ma * mb
    )
    va = F.col("qa") - F.col("sfa").cast("double") * F.col("sfa") / F.col("na")
    vb = F.col("qb") - F.col("sfb").cast("double") * F.col("sfb") / F.col("nb")
    sim = num / (F.sqrt(va) * F.sqrt(vb))
    return (
        j.select("item_a", "item_b", "nc", va.alias("va"), vb.alias("vb"), sim.alias("sim"))
        .filter((F.col("nc") >= min_common) & (F.col("va") > 0) & (F.col("vb") > 0))
        .filter(F.col("sim") > 0)
        .select("item_a", "item_b", "nc", "sim")
    )


def cf_predict(
    rf: DataFrame, sims: DataFrame, quantize: int | None = 4, k: int | None = None
) -> DataFrame:
    """Weighted-average predictions for every (target, user) with >=2 overlap.

    ``sims`` is the output of :func:`cf_item_similarities` (directed:
    item_a = target). With ``quantize`` the weights become scaled integers so
    the sums are exact (the declared-query mode); ``None`` keeps full-precision
    doubles (reference-parity mode, tested with tolerance).

    ``k`` caps each target's neighborhood to its k most-similar items before
    the weighted sum — the spec's "Use 50 neighbors"
    (Assignment 3 Description.htm:90); the reference CODE applies no cap
    (a3_p2.py:52-65), which is ``k=None``. Ranking is (sim desc, item_b asc);
    similarities are engine-stable doubles (integer sufficient statistics),
    so the cutoff is deterministic cross-engine. The rank is a bounded
    window per target — at scale each target holds at most its candidate
    items, already filtered to >=2 common users and sim > 0.
    Returns (target, user_id, pred).
    """
    if k is not None:
        wr = Window.partitionBy("item_a").orderBy(F.desc("sim"), F.asc("item_b"))
        sims = (
            sims.withColumn("_rk", F.row_number().over(wr))
            .filter(F.col("_rk") <= k)
            .drop("_rk")
        )
    if quantize is not None:
        scale = 10 ** quantize
        w = round_stable(F.col("sim") * scale, 0).cast("long")
    else:
        w = F.col("sim")
    sw = sims.select(
        F.col("item_a").alias("target"), F.col("item_b").alias("item"), w.alias("w")
    ).filter(F.col("w") > 0)
    ov = (
        rf.join(sw, "item")
        .groupBy("target", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_ov"),
            F.sum(F.col("rating") * F.col("w")).alias("num"),
            F.sum("w").alias("den"),
        )
        .filter(F.col("n_ov") >= 2)
    )
    actual = rf.select(
        F.col("item").alias("target"), "user_id", F.col("rating").alias("actual")
    ).join(sw.select("target").distinct(), "target", "left_semi")
    if quantize is not None:
        # num and den are exact integers (quantized weights x integer
        # ratings), so round(num/den, 4) can be done entirely in integer
        # arithmetic: half-up(v*1e4) = (2*num*1e4 + den) div (2*den) for
        # v = num/den > 0. This sidesteps the engine-divergent double
        # rounding edge (Spark rounds the shortest-decimal rendering of the
        # double, DuckDB the binary value — they disagree when num/den lands
        # within 1 ulp of a .00005 boundary, observed at sf0.01 with k=50).
        pred_w = F.expr("(num * 20000 + den) div (den * 2)").cast("double") / 10000.0
    else:
        pred_w = round_stable(F.col("num").cast("double") / F.col("den"))
    pred = F.coalesce(F.col("actual").cast("double"), pred_w)
    return (
        ov.join(actual, ["target", "user_id"], "left")
        .select("target", "user_id", pred.alias("pred"))
        .filter(F.col("pred") > 0)
    )
