"""Unit tests for the round-10-budget forward batch (authored in round 9):
DSIR importance weights, BPE fertility (tokenizer application), and the
streaming prefix-dedup twin. The full differential against the DuckDB
oracles runs in test_catalog_oracle; here we pin the local driver-gate
mirror plus the cross-family reconciliations."""

from __future__ import annotations

from collections import defaultdict

from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.plans.round13q import N_MERGES
from big_data_analytics_mini_projects_spark.plans.round15q import DSIR_TARGET

from .compare import assert_df_equal


def test_round15q_differential(spark, duck, sf_dir):
    """Local mirror of the driver gate for all three forward queries."""
    for name in (
        "dsir_importance_weights",
        "bpe_fertility_by_source",
        "streaming_dedup_docs",
    ):
        spec = QUERIES[name]
        assert_df_equal(spec.build(spark, sf_dir), duck, spec.oracle)


def test_dsir_target_docs_score_higher(spark, sf_dir):
    """The importance ratio is trained TOWARD the target source, so target
    docs must average a higher log-weight than the rest of the corpus (the
    per-bucket ratios are literally their own likelihoods)."""
    rows = QUERIES["dsir_importance_weights"].build(spark, sf_dir).collect()
    assert rows
    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    tgt = [r["logw"] for r in rows if src[r["doc_id"]] == DSIR_TARGET]
    rest = [r["logw"] for r in rows if src[r["doc_id"]] != DSIR_TARGET]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)
    for r in rows:
        assert r["n_grams"] > 0
        assert r["keep"] == (r["logw"] >= 0)


def test_fertility_reconciles_with_merge_curve(spark, sf_dir):
    """Tokenizer application must account for every symbol the training
    loop left: sum of per-source n_tokens == the curve's final total_syms
    (iteration N_MERGES), and fertility sits in (1, chars-per-word]."""
    fert = QUERIES["bpe_fertility_by_source"].build(spark, sf_dir).collect()
    curve = {
        r["iteration"]: r["total_syms"]
        for r in QUERIES["bpe_merge_curve"].build(spark, sf_dir).collect()
    }
    assert sum(r["n_tokens"] for r in fert) == curve[N_MERGES]
    for r in fert:
        assert r["n_words"] > 0
        # at least one merge applies somewhere, so fertility < raw chars;
        # merges never drop a word below one token
        assert 1.0 <= r["fertility"]
        assert abs(r["fertility"] - r["n_tokens"] / r["n_words"]) < 1e-6


def test_streaming_dedup_reconciles_with_canonical_quality(spark, sf_dir):
    """Same prefix-12 group key as dedup_canonical_quality: the dup count
    per group must equal its n_dropped, and every multi-doc group the batch
    query reports must show exactly one keeper here."""
    sd = QUERIES["streaming_dedup_docs"].build(spark, sf_dir).collect()
    assert sd
    by_keeper = defaultdict(list)
    for r in sd:
        assert r["is_dup"] == (r["doc_id"] != r["keeper_id"])
        assert r["keeper_id"] <= r["doc_id"]
        by_keeper[r["keeper_id"]].append(r["doc_id"])
    cq = QUERIES["dedup_canonical_quality"].build(spark, sf_dir).collect()
    assert cq, "fixture must contain multi-doc prefix groups"
    # batch groups with n>1 <-> streaming keeper groups with >1 member
    stream_groups = {
        frozenset(v) for v in by_keeper.values() if len(v) > 1
    }
    batch_total_dropped = sum(r["n_dropped"] for r in cq)
    assert sum(1 for r in sd if r["is_dup"]) == batch_total_dropped
    assert len(stream_groups) == len(cq)


def test_round15q_batch2_differential(spark, duck, sf_dir):
    for name in ("multimodal_bmp_resize", "epoch_schedule_budget"):
        spec = QUERIES[name]
        assert_df_equal(spec.build(spark, sf_dir), duck, spec.oracle)


def test_bmp_resize_golden(spark):
    """Hand-checked golden for one image: doc_id=1 -> source 5x3, target
    3x2; NN indices x2=0,1,2 -> sx=0,1,3 and y2=0,1 -> sy=0,1. Pixel
    channel sum at (x,y) = (1+3x+7y)%256 + (2+x+y)%256 + (xy+1)%256.
    Also: resized payload must be a VALID BMP the ordinary decoder reads."""
    from big_data_analytics_mini_projects_spark.operators.multimodal import (
        decode_bmp_stats,
        synth_bmp_payloads,
    )
    from big_data_analytics_mini_projects_spark.operators.multimodal_resize import (
        resize_bmp_nn,
    )
    from big_data_analytics_mini_projects_spark.plans.round15q import (
        RESIZE_H,
        RESIZE_W,
    )

    docs = spark.createDataFrame([(1,)], "doc_id long")
    out = decode_bmp_stats(
        resize_bmp_nn(synth_bmp_payloads(docs), RESIZE_W, RESIZE_H)
    ).collect()[0]

    def chan_sum(d, x, y):
        return (d + 3 * x + 7 * y) % 256 + (2 * d + x + y) % 256 + (x * y + d) % 256

    want = sum(
        chan_sum(1, (x2 * 5) // RESIZE_W, (y2 * 3) // RESIZE_H)
        for y2 in range(RESIZE_H)
        for x2 in range(RESIZE_W)
    )
    assert (out["width"], out["height"]) == (RESIZE_W, RESIZE_H)
    assert out["px_sum"] == want


def test_epoch_schedule_invariants(spark, sf_dir):
    """Allocation sums to ~the 3x budget; epochs never exceed the cap;
    overflow is positive exactly where the cap binds."""
    rows = QUERIES["epoch_schedule_budget"].build(spark, sf_dir).collect()
    assert rows
    total = sum(r["m"] for r in rows)
    alloc = sum(r["alloc_tokens"] for r in rows)
    assert abs(alloc - 3 * total) / (3 * total) < 0.01  # rounding slack only
    for r in rows:
        assert r["epochs"] <= 2.5 + 1e-9
        assert r["epochs"] <= r["epochs_raw"] + 1e-9
        if r["overflow_tokens"] > 0:
            assert r["epochs_raw"] > 2.5
        else:
            assert r["epochs_raw"] <= 2.5 + 1e-9


def test_state_probe_reconciles_with_batch_twin(spark, sf_dir):
    """The stream-static probe must emit EXACTLY the batch twin's verified
    state-match pair set, and its per-doc MIN keeper must equal
    dedup_state_compaction's dup_of_state keepers; the per-row minhash
    formulation must agree bit-for-bit with the aggregate-based chain."""
    pairs = QUERIES["streaming_dedup_state_probe"].build(spark, sf_dir).collect()
    assert pairs
    for r in pairs:
        assert r["doc_d"] % 2 == 1 and r["doc_s"] % 2 == 0
        assert r["n_agree"] >= 4
    keepers = defaultdict(list)
    for r in pairs:
        keepers[r["doc_d"]].append(r["doc_s"])
    want = {
        r["doc_id"]: r["keeper_id"]
        for r in QUERIES["dedup_state_compaction"].build(spark, sf_dir).collect()
        if r["status"] == "dup_of_state"
    }
    assert {d: min(ks) for d, ks in keepers.items()} == want


def test_row_sig_band_matches_aggregate_chain(spark, sf_dir):
    """The per-row (streamable) minhash+banding expression is bit-identical
    to the aggregate-based operators/similarity chain on the same corpus."""
    from pyspark.sql import functions as F

    from big_data_analytics_mini_projects_spark.operators.similarity import (
        lsh_bands,
        minhash_signatures,
        ngram_shingles,
    )
    from big_data_analytics_mini_projects_spark.plans.round14q import (
        SC_HASHES,
        SC_ROWS,
    )
    from big_data_analytics_mini_projects_spark.plans.round15q import (
        _sig_band_frame,
    )
    from big_data_analytics_mini_projects_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mine = {
        (r["doc_id"], r["band"]): r["band_sig"]
        for r in _sig_band_frame(docs).collect()
    }
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("toks"),
    )
    ref = {
        (r["doc_id"], r["band"]): r["band_sig"]
        for r in lsh_bands(
            minhash_signatures(
                ngram_shingles(toks, n=3, distinct=False),
                token_col="shingle",
                num_hashes=SC_HASHES,
            ),
            SC_ROWS,
        ).collect()
    }
    assert mine == ref and len(mine) > 0
