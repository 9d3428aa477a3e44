"""Collaborative-filtering queries (SURVEY.md §2.8) bound to the synthetic
ratings derivation (FIXTURES.md §B: lineitem⋈orders -> user/item/rating).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import round_stable, sql_round_stable
from ..operators.recommend import cf_filter_ratings, cf_item_similarities, cf_predict
from .shared import SQL_RATINGS_DEDUP, ratings_deduped
from .registry import register
from ..caching import checkpoint_shared, persist_tracked

#: Deterministic target-item predicates, identical in both engines.
SIM_TARGETS = 50   # item % 50 == 0
PRED_TARGETS = 97  # item % 97 == 0

_SQL_FILTERED = f"""
r AS ({SQL_RATINGS_DEDUP}),
i_ok AS (SELECT item FROM r GROUP BY item HAVING COUNT(*) >= 25),
r1 AS (SELECT r.* FROM r JOIN i_ok USING (item)),
u_ok AS (SELECT user_id FROM r1 GROUP BY user_id HAVING COUNT(*) >= 5),
rf AS (SELECT r1.* FROM r1 JOIN u_ok USING (user_id))
"""

#: Scale-form filtered-ratings chain: r (the 60M-row ratings dedup window)
#: and rf (referenced 5x by the sims + prediction tail) pinned MATERIALIZED
#: so DuckDB evaluates the dedup window once instead of inlining it per
#: reference — the same re-evaluation class as the ols_words_pvalues /
#: CC-edges fixes; the inlined form's concurrent window sorts overran the
#: 78 GB temp volume at sf10f even with the prediction-side user anchor
#: (round-6 measurement). Driver-gate oracles unchanged; result equality
#: at driver SFs pinned by tests/test_scale_tools.py.
_SQL_FILTERED_MAT = _SQL_FILTERED.replace(
    "r AS (", "r AS MATERIALIZED (", 1
).replace("rf AS (SELECT", "rf AS MATERIALIZED (SELECT", 1)
assert _SQL_FILTERED_MAT.count("MATERIALIZED") == 2


def _sql_sims(target_mod: int) -> str:
    return f"""
st AS (SELECT item, COUNT(*) AS n, SUM(rating) AS s, SUM(rating*rating) AS q
       FROM rf GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS nc,
         SUM(a.rating * b.rating) AS p, SUM(a.rating) AS sa, SUM(b.rating) AS sb
  FROM rf a JOIN rf b ON a.user_id = b.user_id
  WHERE a.item % {target_mod} = 0
  GROUP BY a.item, b.item),
sims AS (
  SELECT item_a, item_b, nc,
    (p - (CAST(sta.s AS DOUBLE) / sta.n) * sb - (CAST(stb.s AS DOUBLE) / stb.n) * sa
       + nc * (CAST(sta.s AS DOUBLE) / sta.n) * (CAST(stb.s AS DOUBLE) / stb.n))
    / (sqrt(sta.q - CAST(sta.s AS DOUBLE) * sta.s / sta.n)
       * sqrt(stb.q - CAST(stb.s AS DOUBLE) * stb.s / stb.n)) AS sim,
    (sta.q - CAST(sta.s AS DOUBLE) * sta.s / sta.n) AS va,
    (stb.q - CAST(stb.s AS DOUBLE) * stb.s / stb.n) AS vb
  FROM pairs
  JOIN st sta ON item_a = sta.item
  JOIN st stb ON item_b = stb.item),
simsf AS (SELECT item_a, item_b, nc, sim FROM sims
          WHERE nc >= 2 AND va > 0 AND vb > 0 AND sim > 0)
"""


def _filtered_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The dedupe + two-stage support filter is 3 shuffles over the full
    # ratings derivation; downstream it feeds the similarity self-join (3
    # refs) and prediction (2 more). checkpoint_shared leaf -> computed
    # once per family visit AND every consumer plans against a leaf scan
    # instead of re-analyzing the dedup-window tree (the four CF queries
    # carried 178-183-Exchange analyzed plans; guide §3.3).
    # Pre-partitioned on user_id BEFORE the leaf: LogicalRDD preserves the
    # physical outputPartitioning, so the unsalted similarity self-join
    # still runs exchange-free on BOTH sides (the same measured pattern as
    # PageRank's transition matrix / the CC edge table). The salted twin
    # and the item-keyed prediction join reshuffle from the leaf as before.
    return checkpoint_shared(
        "rec.rf",
        sf_dir,
        lambda: persist_tracked(
            cf_filter_ratings(ratings_deduped(spark, sf_dir)).repartition(
                F.col("user_id")
            )
        ),
    )


@register(
    "cf_item_similarity",
    oracle=(
        f"WITH {_SQL_FILTERED}, {_sql_sims(SIM_TARGETS)} "
        f"SELECT item_a, item_b, nc, {sql_round_stable('sim')} AS sim FROM simsf"
    ),
    doc="Centered-cosine item-item similarity for target items (cf_sim, "
    "a3_p2.py:37-49): all targets in one self-join DAG instead of the "
    "reference's per-item broadcast loop; integer sufficient statistics "
    "make the doubles engine-stable.",
    tags=("cf_sim", "join_pairs", "agg_dotprod"),
)
def cf_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    rf = _filtered_ratings(spark, sf_dir)
    sims = cf_item_similarities(rf, F.col("item_a") % SIM_TARGETS == 0)
    return sims.select("item_a", "item_b", "nc", round_stable("sim").alias("sim"))


def _sql_predict(sims_cte: str, user_pred: str = "TRUE") -> str:
    """Prediction tail (mirrors operators/recommend.cf_predict with
    quantize=4) reading similarities from ``sims_cte``.

    ``user_pred`` restricts the PREDICTION-side reads of rf (never the
    similarity computation, which stays corpus-global): the scale forms
    inline the replica-0 user anchor here because DuckDB does not push the
    tool's outer slice through the COALESCE left join + group chain — it
    materialized the full |ratings| x k candidate join and filled the 78 GB
    temp volume (round-6 measurement). TRUE = the driver-gate full form."""
    return (
        f"sw AS (SELECT item_a AS target, item_b AS item, "
        f"CAST(floor(sim * 10000 + 0.5) AS BIGINT) AS w FROM {sims_cte} "
        "WHERE CAST(floor(sim * 10000 + 0.5) AS BIGINT) > 0), "
        "ov AS (SELECT target, user_id, COUNT(*) AS n_ov, "
        "SUM(rating * w) AS num, SUM(w) AS den "
        f"FROM rf JOIN sw USING (item) WHERE {user_pred} "
        "GROUP BY target, user_id), "
        "actual AS (SELECT item AS target, user_id, rating FROM rf "
        f"WHERE item IN (SELECT target FROM sw) AND {user_pred}) "
        # round(num/den, 4) in exact integer arithmetic — num and den are
        # exact integers, and rounding the double quotient is engine-
        # divergent within 1 ulp of a .00005 boundary (see cf_predict).
        "SELECT o.target, o.user_id, "
        "COALESCE(CAST(a.rating AS DOUBLE), "
        "CAST((num * 20000 + den) // (den * 2) AS DOUBLE) / 10000.0) AS pred "
        "FROM ov o LEFT JOIN actual a ON o.target = a.target AND o.user_id = a.user_id "
        "WHERE n_ov >= 2 "
        "AND COALESCE(CAST(a.rating AS DOUBLE), "
        "CAST((num * 20000 + den) // (den * 2) AS DOUBLE) / 10000.0) > 0"
    )


def _pred_sims(spark: SparkSession, sf_dir: str):
    """(rf, sims) for the PRED_TARGETS prediction family, sims a
    checkpoint_shared leaf: cf_predict_ratings and its k50 twin used to
    re-analyze the structurally identical similarity subtree per build
    (the CacheManager shared only the compute); the leaf hands both
    queries and every bench repeat the same truncated plan."""
    rf = _filtered_ratings(spark, sf_dir)
    sims = checkpoint_shared(
        "rec.pred_sims",
        sf_dir,
        lambda: persist_tracked(
            cf_item_similarities(rf, F.col("item_a") % PRED_TARGETS == 0)
        ),
    )
    return rf, sims


#: Replica-0 user anchor for the cf_predict scale forms — matches
#: tools/sf1_differential.SCALE_SLICE (no-op at base SFs where user ids
#: stay below make_sf1's 1e7 replica offset).
_USER_ANCHOR = "user_id < 10000000"


@register(
    "cf_predict_ratings",
    oracle=f"WITH {_SQL_FILTERED}, {_sql_sims(PRED_TARGETS)}, {_sql_predict('simsf')}",
    scale_oracle=(
        f"WITH {_SQL_FILTERED_MAT}, {_sql_sims(PRED_TARGETS)}, "
        f"{_sql_predict('simsf', _USER_ANCHOR)}"
    ),
    doc="REFERENCE-PARITY ONLY — pipelines should use cf_predict_ratings_k50. "
    "Weighted-average rating prediction for target items (cf_predict, "
    "a3_p2.py:52-65,76): actual rating passed through for users who rated "
    "the target; >=2 neighbor overlap required; 4-decimal-quantized weights "
    "keep the weighted sums exact integers. The UNCAPPED neighborhood is "
    "the reference code's wart (the spec says 50): with fixed item "
    "dimension and growing users every target's candidate set densifies — "
    "measured 18.1x cost at 10x data (BASELINE.md round-4). Kept solely so "
    "the oracle matches the surveyed artifact.",
    tags=("cf_predict", "join_broadcast"),
)
def cf_predict_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    rf, sims = _pred_sims(spark, sf_dir)
    return cf_predict(rf, sims, quantize=4)


NEIGHBOR_K = 50  # the spec's cap: Assignment 3 Description.htm:90 "Use 50 neighbors"


@register(
    "cf_predict_ratings_k50",
    oracle=(
        f"WITH {_SQL_FILTERED}, {_sql_sims(PRED_TARGETS)}, "
        "simsk AS (SELECT item_a, item_b, nc, sim FROM ("
        "SELECT *, row_number() OVER (PARTITION BY item_a "
        "ORDER BY sim DESC, item_b ASC) AS rk FROM simsf) "
        f"WHERE rk <= {NEIGHBOR_K}), "
        + _sql_predict("simsk")
    ),
    scale_oracle=(
        f"WITH {_SQL_FILTERED_MAT}, {_sql_sims(PRED_TARGETS)}, "
        "simsk AS (SELECT item_a, item_b, nc, sim FROM ("
        "SELECT *, row_number() OVER (PARTITION BY item_a "
        "ORDER BY sim DESC, item_b ASC) AS rk FROM simsf) "
        f"WHERE rk <= {NEIGHBOR_K}), "
        + _sql_predict("simsk", _USER_ANCHOR)
    ),
    doc="THE PIPELINE DEFAULT for rating prediction (round-4 verdict item "
    "4). cf_predict with the SPEC'd 50-neighbor cap (Assignment 3 "
    "Description.htm:90 'Use 50 neighbors') the reference code omits "
    "(a3_p2.py:52-65): each target's similarity vector is cut to its 50 "
    "most-similar items (sim desc, item_b asc — engine-stable doubles) "
    "before the weighted sum; at sf0.01 targets carry 75-198 neighbors, so "
    "the cap changes real predictions. The cap bounds per-target fan-out to "
    "k regardless of corpus growth — measured 12.8x (~linear) at 10x data "
    "vs the uncapped variant's 18.1x densification; plan shape pinned in "
    "tests/test_recommend.py. k=None (cf_predict_ratings) stays the "
    "reference-code-parity query.",
    tags=("cf_predict", "topk"),
)
def cf_predict_ratings_k50(spark: SparkSession, sf_dir: str) -> DataFrame:
    rf, sims = _pred_sims(spark, sf_dir)
    return cf_predict(rf, sims, quantize=4, k=NEIGHBOR_K)


@register(
    "cf_item_similarity_salted",
    oracle=(
        f"WITH {_SQL_FILTERED}, {_sql_sims(SIM_TARGETS)} "
        f"SELECT item_a, item_b, nc, {sql_round_stable('sim')} AS sim FROM simsf"
    ),
    doc="cf_item_similarity through the block-decomposed skew path "
    "(operators/recommend.py cf_item_similarities salt_blocks=4): users with "
    ">=16 ratings have their pair space split over a 4x4 block grid keyed "
    "(user, ga, gb), spreading a power user's quadratic pair fan-out across "
    "16 shuffle partitions; cold users take the plain self-join. The block "
    "id never reaches the aggregation, so results are bit-identical to "
    "cf_item_similarity — the oracle is the same SQL. At 100 TB this is the "
    "guard for skew beyond what AQE skew-split handles (a single user whose "
    "pair count exceeds one executor's memory).",
    tags=("cf_sim", "join_pairs", "skew"),
)
def cf_item_similarity_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    rf = _filtered_ratings(spark, sf_dir)
    sims = cf_item_similarities(
        rf, F.col("item_a") % SIM_TARGETS == 0, salt_blocks=4, salt_min_ratings=16
    )
    return sims.select("item_a", "item_b", "nc", round_stable("sim").alias("sim"))
