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
    hll_distinct,
    sql_hll_distinct,
)
from ..sources.tables import load_table
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
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
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
