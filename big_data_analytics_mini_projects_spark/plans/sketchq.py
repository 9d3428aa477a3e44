"""Sketch queries: HLL distinct-user estimates and Count-Min heavy hitters —
the fixed-memory single-pass "streaming algorithms" surface (extends the
reference's one-pass sampler, sampler_v02.py:63-87, to the sketches a 100 TB
pipeline actually runs when exact DISTINCT / GROUP BY counts stop fitting).
Both are bit-deterministic across engines (see operators/sketches.py), so
they sit inside the full hash-compared oracle gate rather than a tolerance
check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import sql_tokens_ws, tokenize_ws
from ..operators.sketches import (
    cm_estimate,
    cm_sketch_counts,
    histogram_quantiles,
    hll_distinct,
    sql_hll_distinct,
)
from ..sources.tables import load_table, spread
from .registry import register

HLL_P = 9  # 512 registers
CM_DEPTH = 4
CM_WIDTH = 256
TOP_WORDS = 20


@register(
    "sketch_hll_users",
    oracle=(
        f"WITH est AS ({sql_hll_distinct('SELECT event_type, user_id FROM events', 'user_id', ['event_type'], HLL_P)}), "
        "ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact "
        "FROM events GROUP BY event_type) "
        "SELECT ex.event_type, n_exact, n_est FROM ex JOIN est USING (event_type)"
    ),
    doc="HLL-style distinct users per event type (512 registers, exact "
    "scaled-integer harmonic sum) next to the exact count: the single-pass "
    "mergeable replacement for COUNT(DISTINCT) at cardinalities where the "
    "key set itself no longer fits.",
    tags=("sketch", "agg_distinct"),
)
def sketch_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    est = hll_distinct(ev, "user_id", ["event_type"], p=HLL_P)
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return exact.join(est, "event_type").select("event_type", "n_exact", "n_est")


@register(
    "sketch_cm_heavy_hitters",
    oracle=(
        f"WITH toks AS ({sql_tokens_ws()}), "
        "truec AS (SELECT word, COUNT(*) AS true_cnt FROM toks GROUP BY word "
        f"ORDER BY true_cnt DESC, word ASC LIMIT {TOP_WORDS}), "
        f"seeds AS (SELECT unnest(range({CM_DEPTH})) AS seed), "
        "sk AS (SELECT seed, "
        "(('0x' || substr(md5('cm' || CAST(seed AS VARCHAR) || ':' || word), 1, 15))::BIGINT) "
        f"% {CM_WIDTH} AS bucket, COUNT(*) AS c "
        "FROM toks CROSS JOIN seeds GROUP BY seed, bucket), "
        "cand AS (SELECT word, true_cnt, seed, "
        "(('0x' || substr(md5('cm' || CAST(seed AS VARCHAR) || ':' || word), 1, 15))::BIGINT) "
        f"% {CM_WIDTH} AS bucket FROM truec CROSS JOIN seeds) "
        "SELECT word, true_cnt, MIN(c) AS cm_est "
        "FROM cand JOIN sk USING (seed, bucket) GROUP BY word, true_cnt"
    ),
    doc="Count-Min heavy hitters over the token stream (4x256 integer "
    "sketch): top-20 true counts vs the sketch's min-of-buckets upper bound "
    "— frequency estimation in fixed memory, mergeable by addition.",
    tags=("sketch", "topk", "agg_count_by_key"),
)
def sketch_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = tokenize_ws(docs).select("word")
    sketch = cm_sketch_counts(toks, "word", depth=CM_DEPTH, width=CM_WIDTH)
    true_top = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("word"))
        .limit(TOP_WORDS)
    )
    return cm_estimate(
        sketch, true_top, item_col="word", depth=CM_DEPTH, width=CM_WIDTH
    ).select("word", "true_cnt", "cm_est")


Q_LO, Q_HI, Q_BINS = 0.0, 102400.0, 1024  # width 100; orders <= ~60k
Q_PROBS = (0.5, 0.9, 0.99)


@register(
    "sketch_quantile_histogram",
    oracle=(
        f"WITH b AS (SELECT LEAST(GREATEST(CAST(floor((o_totalprice - {Q_LO}) "
        f"/ {(Q_HI - Q_LO) / Q_BINS}) AS BIGINT), 0), {Q_BINS - 1}) AS bin "
        "FROM orders), "
        "counts AS (SELECT bin, COUNT(*) AS c FROM b GROUP BY bin), "
        "cum AS (SELECT bin, SUM(c) OVER (ORDER BY bin "
        "ROWS UNBOUNDED PRECEDING) AS n_le FROM counts), "
        "tot AS (SELECT SUM(c) AS n FROM counts), "
        f"probs AS (SELECT unnest([{', '.join(str(p) for p in Q_PROBS)}]) AS p), "
        "hits AS (SELECT p, bin, n_le FROM cum CROSS JOIN tot CROSS JOIN probs "
        "WHERE n_le >= ceil(p * n)) "
        "SELECT p, bin, CAST(n_le AS BIGINT) AS n_le, "
        f"floor(({Q_LO} + (bin + 1) * {(Q_HI - Q_LO) / Q_BINS}) * 10000 + 0.5) / 10000 AS est "
        "FROM (SELECT p, bin, n_le, row_number() OVER (PARTITION BY p "
        "ORDER BY bin) AS rn FROM hits) WHERE rn = 1"
    ),
    doc="Mergeable histogram-quantile sketch over order values (1024 uniform "
    "bins, p50/p90/p99): integer bin counts merge by addition across "
    "partitions/shards/days; the quantile is the first bin whose cumulative "
    "count reaches ceil(p*n) (error <= one bin width). The fixed-memory "
    "complement to the exact rank-based quantile_order_value — completes "
    "the sketch trilogy (HLL, Count-Min, quantiles).",
    tags=("sketch", "quantile", "histogram"),
)
def sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return histogram_quantiles(
        orders, "o_totalprice", list(Q_PROBS), Q_LO, Q_HI, Q_BINS
    )
