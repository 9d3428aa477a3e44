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
    "bm25f_title_body",     # (n_docs, avg_t, avg_b) scalar
    "pmi_word_pairs",       # total-pair-count scalar
    "label_drift_chi2",     # contingency grand-total scalar
    "funnel_conversion",    # three stage-count scalars
    "kmeans_lloyd_step",    # K=8 centroid frame
    "ann_ivf_nprobe",       # |Q| x 10-cell centroid frame (broadcast-bounded)
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
    # broadcast 1-row corpus-count frame driving the occupancy-rule band
    # width (round-6 retune)
    "dedup_embedding_bucketed",
}


#: Round-6 verification rotation (catalog.py tiers 1-3): the 34 stale
#: driver greens (samplingq/sourcesq/relationalx/multimodalq — incl. the two
#: applyInPandasWithState streaming twins), the retuned
#: dedup_embedding_bucketed + this round's new round6q queries, and the
#: doc-only recommendq tail. Every one MUST register inside the driver's
#: 50-entry window or it gets no fresh verdict this round.
ROUND6_WINDOW_SET = {
    # tier 1: stale driver greens (samplingq x7, sourcesq x5,
    # relationalx x12, multimodalq x10)
    "agg_distinct_users", "welford_global_stats", "sample_hashbucket_stats",
    "sample_twopass_stats", "events_hourly", "session_windows_users",
    "sample_stratified",
    "scan_csv_transactions", "scan_text_reviews", "bucketed_join_orders",
    "sort_out_nation_stats", "sink_partitioned_pruned",
    "rollup_revenue", "cube_orders_status_priority", "tpch_q5_local_supplier",
    "range_join_purchase_context", "rolling_avg_user_value",
    "quantile_order_value", "pivot_user_event_matrix",
    "unpivot_lineitem_measures", "window_ranks_customers",
    "listagg_nation_names", "tpch_q18_large_orders", "histogram_order_values",
    "multimodal_meta", "multimodal_frames", "multimodal_wav_decode",
    "multimodal_bmp_decode", "streaming_welford_stats",
    "streaming_hourly_counts", "streaming_user_stats",
    "streaming_scd2_intervals", "streaming_interval_join",
    "streaming_dedup_events",
    # tier 2: round-6 work (round6q — retune + new queries)
    "dedup_embedding_bucketed",
    # tier 3: doc-only recommendq tail
    "cf_item_similarity", "cf_predict_ratings", "cf_predict_ratings_k50",
    "cf_item_similarity_salted",
}


def test_round6_window_positions():
    """The driver checks exactly the first 50 registration positions
    (CORRECTNESS_r03/r04/r05 all hold exactly that set); the whole round-6
    verification rotation must sit inside them. round6q's new queries are
    included dynamically: every round6q registration is window-mandatory."""
    order = list(QUERIES)
    # mandatory = explicit set + everything registered by plans.round6q
    import big_data_analytics_mini_projects_spark.plans.round6q as r6

    r6_registered = {
        n for n in QUERIES
        if callable(getattr(r6, n, None))
    }
    mandatory = ROUND6_WINDOW_SET | r6_registered
    late = {n for n in mandatory if order.index(n) >= 50}
    assert not late, f"outside the 50-entry driver window: {sorted(late)}"
    assert len(mandatory) <= 50


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
