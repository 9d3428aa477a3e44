"""Semantics-level unit tests for the round-7-authored round9q forward batch
(round-8 window): within-doc repeat localization, streaming sliding windows,
and the Lloyd-refined IVF chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.plans.round9q import (
    IVFL_K,
    IVFL_QUERIES,
    WD_K,
    withindoc_repeat_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_withindoc_repeated_paragraph_detected(spark):
    """A doc that repeats a 12-token paragraph twice flags exactly those
    positions; a doc with all-distinct tokens flags nothing; and the
    CROSS-doc query must see neither (self-repeats only)."""
    para = " ".join(f"p{i}" for i in range(WD_K))
    rep_doc = para + " mid " + para            # spans 0..? repeated
    uniq_doc = " ".join(f"u{i}" for i in range(30))
    docs = _docs(spark, [(0, rep_doc), (1, uniq_doc)])

    out = {r["doc_id"]: r for r in withindoc_repeat_stats(docs).collect()}
    assert 1 not in out                       # nothing repeated within doc 1
    r = out[0]
    # doc 0: 25 tokens; the two copies of the paragraph each cover 12
    # tokens as single islands (positions 0 and 13) -> 24 repeated tokens
    assert r["n_tokens"] == 25
    assert r["rep_tokens"] == 24
    assert r["n_islands"] == 2
    assert r["rep_ratio"] == 0.96

    from big_data_analytics_mini_projects_spark.plans.round7q import (
        exact_substring_stats,
    )

    cross = exact_substring_stats(docs).collect()
    assert cross == []                        # distinct-doc rule: no pairs


def test_withindoc_overlapping_self_repeat_merges(spark):
    """'a a a ... a' (20 copies of one token): every 12-token span is
    identical, so all positions merge into ONE island covering the doc."""
    docs = _docs(spark, [(0, " ".join(["a"] * 20))])
    r = withindoc_repeat_stats(docs).collect()[0]
    assert (r["n_tokens"], r["rep_tokens"], r["n_islands"]) == (20, 20, 1)
    assert r["rep_ratio"] == 1.0


def test_streaming_sliding_equals_batch_twin(spark, sf_dir):
    """Shared-oracle twins must agree row-for-row on the engine side too."""
    batch = {
        (r["win_start_us"], r["event_type"]): (r["n"], r["sum_value"])
        for r in QUERIES["sliding_window_event_rate"].build(spark, sf_dir).collect()
    }
    stream = {
        (r["win_start_us"], r["event_type"]): (r["n"], r["sum_value"])
        for r in QUERIES["streaming_sliding_counts"].build(spark, sf_dir).collect()
    }
    assert stream == batch
    assert QUERIES["streaming_sliding_counts"].oracle == (
        QUERIES["sliding_window_event_rate"].oracle
    )


def test_ivf_lloyd_full_probe_equals_brute_force(spark, sf_dir):
    """With nprobe == #cells the Lloyd-refined IVF must return exactly the
    brute-force top-k (partition completeness: the a2 lists cover every
    vector exactly once, whatever the centroids did)."""
    from big_data_analytics_mini_projects_spark.operators.vector import (
        cosine_topk,
        prepare_vectors,
    )
    from big_data_analytics_mini_projects_spark.plans import round9q
    from big_data_analytics_mini_projects_spark.sources.tables import load_table

    out = QUERIES["ann_ivf_lloyd"].build(spark, sf_dir)
    # count distinct cells actually used, then re-run with nprobe >= cells
    vecs = prepare_vectors(load_table(spark, sf_dir, "embeddings"))
    n_cells = vecs.select("label").distinct().count()
    old = round9q.IVFL_NPROBE
    try:
        round9q.IVFL_NPROBE = n_cells
        full = QUERIES["ann_ivf_lloyd"].build(spark, sf_dir)
        q = vecs.filter(F.col("vec_id") < IVFL_QUERIES)
        brute = cosine_topk(vecs, q, IVFL_K)
        got = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"]) for r in full.collect()
        )
        want = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"]) for r in brute.collect()
        )
        assert got == want
    finally:
        round9q.IVFL_NPROBE = old
    # and the default nprobe=3 result is a plausible subset: right row count
    assert out.count() == IVFL_QUERIES * IVFL_K
