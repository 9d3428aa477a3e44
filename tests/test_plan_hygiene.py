"""Catalog-wide physical-plan hygiene: every benched query's plan is audited
for the node types that kill 100 TB jobs, with explicit allowlists for the
places they are deliberate.

Invariants:
- NO row-at-a-time Python UDF (BatchEvalPython) anywhere — Python in a hot
  path must be Arrow-vectorized or absent.
- NO grouped-map pandas (FlatMapGroupsInPandas) — per-group materialization
  scales with the corpus (the round-1 OLS flaw; closed forms replaced it).
- NO unhinted CartesianProduct anywhere.
- ArrowEvalPython (vectorized pandas UDF) only where declared: the t_sf
  p-value evaluation over K aggregated rows. Catalyst prunes it from
  ols_simple/multi because the column is dropped — only the pvalues query
  keeps it.
- MapInPandas only in the multimodal decode plumbing (Arrow-batched by
  design).
- BroadcastNestedLoopJoin only for (a) 1-row/bounded-K broadcast cross
  joins of corpus-stats frames and (b) the documented brute-force ANN
  baselines whose blocked twins are the scale path.
"""

from __future__ import annotations

from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES

ARROW_EVAL_OK = {"ols_words_pvalues"}
MAP_IN_PANDAS_OK = {
    "multimodal_meta",
    "multimodal_frames",
    "multimodal_wav_decode",  # real stdlib WAV codec round trip
    "multimodal_bmp_decode",  # real stdlib BMP codec round trip
    "multimodal_png_decode",  # real stdlib zlib-compressed PNG round trip
}
BNLJ_OK = {
    # 1-row corpus-stats / bounded-K broadcast cross joins:
    "tfidf_top_terms",      # n_docs scalar
    "bm25_top_terms",       # (n_docs, avgdl) scalar
    "pmi_word_pairs",       # total-pair-count scalar
    "label_drift_chi2",     # contingency grand-total scalar
    "funnel_conversion",    # three stage-count scalars
    "kmeans_lloyd_step",    # K=8 centroid frame
    "ols_simple_words",     # dense docs x top-K word frame (broadcast-bounded)
    "ols_simple_words_zero_rows",
    "ols_multi_words",
    "ols_words_pvalues",
    # documented brute-force baselines (blocked twins are the scale path):
    "ann_cosine_topk",
    "dedup_embedding_cosine",
    # 1-row aggregate cross joins assembling the (nodes, edges, triangles) row:
    "triangle_count_knn",
    # Q4's scalar floor date: a 1-row aggregate broadcast onto lineitem
    "tpch_q4_order_priority",
    # TPC-H completion batch: 1-row scalar-subquery broadcasts
    "tpch_q11_important_parts",   # global value total
    "tpch_q15_top_supplier",      # MAX(total_revenue) scalar
    "tpch_q22_dormant_customers", # avg positive balance scalar
    # broadcast 1-row model-weights frame
    "quality_classifier_score",
}


#: Round-5 verification backlog (catalog.py tier 1): the 15 never-driver-
#: verified queries, the round-4 plan-rewrite families, and the
#: F.round->round_stable epilogue-migration tails. Every one MUST register
#: inside the driver's 50-entry window or it gets no fresh verdict this round.
ROUND5_WINDOW_SET = {
    # tier 1a: never driver-verified (tpchfull x13 + privacyq x2)
    "tpch_q2_min_price_supplier", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q10_returned_items", "tpch_q11_important_parts",
    "tpch_q12_priority_lines", "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt", "tpch_q17_small_qty_revenue",
    "tpch_q20_promotion_suppliers", "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers", "pii_redaction", "quality_classifier_score",
    # tier 1b: round-4 plan rewrites (similarityq x10 + graphq + textanalysisq x4)
    "minhash_jaccard", "minhash_fast_jaccard", "lsh_candidates",
    "dedup_minhash_lsh", "dedup_clusters", "dedup_clusters_twophase",
    "dedup_exact", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_apply_canonical", "pagerank_trade_graph", "lang_id_ngram",
    "token_counts_by_source", "doc_fingerprints", "tfidf_top_terms",
    # tier 1c: epilogue-migration tails (qaq x5 + corpusq x7 + sketchq x3 +
    # mlq + pipelineq x4)
    "pmi_word_pairs", "label_drift_chi2", "multimodal_png_decode",
    "streaming_session_windows", "range_overlap_sessions",
    "bigram_lm_successors", "scd2_user_event_intervals",
    "sample_weighted_reservoir", "embedding_int8_quantize",
    "bloom_filter_join_prune", "embedding_zscore_by_label",
    "skew_profile_events", "sketch_hll_users", "sketch_cm_heavy_hitters",
    "sketch_quantile_histogram", "momentum_gd_linreg", "dedup_incremental",
    "kmeans_lloyd_step", "funnel_conversion", "bm25_top_terms",
}


def test_round5_window_positions():
    """The driver checks exactly the first 50 registration positions
    (CORRECTNESS_r03/r04 both hold exactly that set); the whole round-5
    verification backlog must sit inside them."""
    order = list(QUERIES)
    late = {n for n in ROUND5_WINDOW_SET if order.index(n) >= 50}
    assert not late, f"outside the 50-entry driver window: {sorted(late)}"
    assert len(ROUND5_WINDOW_SET) == 50


def test_catalog_plan_hygiene(spark, sf_dir):
    problems = []
    for name, spec in QUERIES.items():
        if not spec.bench:
            continue
        df = spec.build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "simple"
        )
        if "BatchEvalPython" in plan:
            problems.append(f"{name}: row-at-a-time Python UDF")
        if "FlatMapGroupsInPandas" in plan:
            problems.append(f"{name}: grouped-map pandas materialization")
        if "CartesianProduct" in plan:
            problems.append(f"{name}: CartesianProduct")
        if "ArrowEvalPython" in plan and name not in ARROW_EVAL_OK:
            problems.append(f"{name}: unexpected ArrowEvalPython")
        if "MapInPandas" in plan and name not in MAP_IN_PANDAS_OK:
            problems.append(f"{name}: unexpected MapInPandas")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            problems.append(f"{name}: unexpected BroadcastNestedLoopJoin")
    assert not problems, "\n".join(problems)


def test_minhash_simhash_no_scatter_exchange(spark, sf_dir):
    """The sf1 scale rehearsal's shuffle fix, pinned as a plan shape: the
    signature/fingerprint aggregations must not exchange on (doc, shingle) —
    that partitioning scatters every doc across every partition and defeats
    the per-doc partial aggregation (measured 60x shuffle inflation at 50k
    docs). Allowed exchanges: spread()'s round-robin of the compact doc rows
    plus ONE hash exchange on doc_id alone."""
    import re

    from big_data_analytics_mini_projects_spark.operators.similarity import (
        minhash_signatures,
        simhash_values,
    )
    from big_data_analytics_mini_projects_spark.plans.similarityq import (
        NUM_HASHES,
        _shingles,
    )

    for build in (
        lambda: minhash_signatures(
            _shingles(spark, sf_dir, distinct=False),
            token_col="shingle",
            num_hashes=NUM_HASHES,
        ),
        lambda: simhash_values(
            _shingles(spark, sf_dir, distinct=False), spark, token_col="shingle"
        ),
    ):
        plan = build()._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        exchanges = re.findall(r"Exchange [^\n]*", plan)
        assert len(exchanges) == 2, exchanges
        hash_exch = [e for e in exchanges if "hashpartitioning" in e]
        assert len(hash_exch) == 1, exchanges
        assert "shingle" not in hash_exch[0], hash_exch
