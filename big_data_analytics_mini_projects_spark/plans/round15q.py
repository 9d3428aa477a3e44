"""Round-10-budget forward batch (authored in round 9; registered at the
catalog TAIL so the round-9 driver window is untouched — ROUND_QUEUE.md).

Six queries extending the data-selection / tokenizer / dedup / multimodal
/ mixing families a large-scale training-data pipeline needs:

- ``dsir_importance_weights`` — DSIR-style data selection (Xie et al. 2023,
  "Data Selection for Language Models via Importance Resampling"): hashed
  bigram features, per-bucket smoothed log-likelihood ratio between a
  TARGET source distribution and the whole-corpus distribution, per-doc
  importance log-weight as the sum of its occurrences' ratios. The float
  discipline is the doc_perplexity_bigram/tfidf precedent: ln() over
  exact integer counts, per-term 8dp rounding + exact-decimal sum (dsum),
  stable-rounded output.
- ``bpe_fertility_by_source`` — APPLY the trained BPE merges: after the
  bpe_merge_curve chain's N_MERGES merges, every word type carries its
  final spelling length; joining that against the per-source word stream
  yields tokens-per-word (fertility) by source — the tokenizer-health
  metric a pipeline reads per domain before committing a vocab. Shares
  bpe_merge_chain / _sql_bpe_chain with bpe_merge_curve, so the two
  queries reconcile exactly (sum of per-source n_tokens == the curve's
  final total_syms; pinned in tests/test_round15q.py).
- ``streaming_dedup_docs`` — stateful STREAMING twin of the prefix-
  boilerplate dedup family: documents stream through
  applyInPandasWithState keyed by the md5 of their first ES_K=12 tokens
  (dedup_canonical_quality's group key, byte-identical construction);
  state is ONE long per group (the minimum doc_id seen), and every doc is
  append-emitted with its keeper attribution. Under availableNow the
  whole corpus is one batch per key, so keeper == the global group MIN —
  the batch oracle. First-seen-wins is the live-stream contract (append
  mode cannot retract an earlier keeper); documented, and exactly how a
  streaming ingest dedup behaves in production.
- ``multimodal_bmp_resize``  — REAL image resize round trip (the transform
  leg of the multimodal brief): parse the genuine BMP payload, nearest-
  neighbor resample, re-encode a valid BMP, decode with the ordinary
  decoder; dims + RGB sum against the pattern's closed form.
- ``epoch_schedule_budget``  — data-constrained epoch scheduling: a 3x
  token budget allocated by temperature-mixed shares implies per-source
  epoch counts, capped, with the reallocatable overflow reported.
- ``streaming_dedup_state_probe`` — STREAM-STATIC join dedup: the delta
  streams against the static state band index; the per-ROW streamable
  minhash+banding formulation (one codegen SQL expression, no aggregation
  state) is pinned bit-identical to the aggregate chain in
  tests/test_round15q.py::test_row_sig_band_matches_aggregate_chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import checkpoint_shared, persist_tracked
from ..functions.hashing import h64, h64_sql
from ..functions.text import ngram_expr, round_stable, sql_round_stable
from ..operators.aggregates import dsum, sql_dsum
from ..sources.tables import load_table, spread
from .registry import register
from .round13q import N_MERGES, _WORD_RE, _sql_bpe_chain, bpe_merge_chain
from .shared import ES_K, _sql_alpha_w

# --------------------------------------------------------------------------
# dsir_importance_weights
# --------------------------------------------------------------------------

DSIR_BUCKETS = 512      # hashed bigram feature space (the DSIR paper uses 10k)
DSIR_TARGET = "src0"    # the target domain the ratio is trained toward

#: ln-ratio expression, written with IDENTICAL operator order in both
#: engines (left-associative +/-) so the four ln() doubles combine through
#: the same IEEE operation sequence before the 8dp term rounding.
_LOGR = (
    "ln(n_t + 1) - ln(tot_t + {B}) - ln(n_c + 1) + ln(tot_c + {B})"
)


@register(
    "dsir_importance_weights",
    oracle=(
        "WITH tarr AS (SELECT doc_id, source, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks "
        "FROM documents), "
        "g AS (SELECT doc_id, source, "
        + h64_sql("gram", "dsir")
        + f" % {DSIR_BUCKETS} AS b FROM ("
        "SELECT doc_id, source, unnest(CASE WHEN len(toks) >= 2 THEN "
        "list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' ')) "
        "ELSE []::VARCHAR[] END) AS gram FROM tarr)), "
        "r AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_c, "
        f"CAST(SUM(CASE WHEN source = '{DSIR_TARGET}' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_t FROM g GROUP BY b), "
        "rt AS (SELECT b, "
        + _LOGR.format(B=DSIR_BUCKETS).replace(
            "tot_t", "(SELECT SUM(n_t) FROM r)"
        ).replace("tot_c", "(SELECT SUM(n_c) FROM r)")
        + " AS logr FROM r), "
        "j AS (SELECT g.doc_id, rt.logr FROM g JOIN rt USING (b)), "
        "a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
        + sql_round_stable(sql_dsum("logr", 8), 6)
        + " AS logw FROM j GROUP BY doc_id) "
        "SELECT doc_id, n_grams, logw, logw >= 0 AS keep FROM a"
    ),
    doc="DSIR importance weights (hashed-ngram importance resampling, the "
    "published data-selection shape): every whitespace bigram occurrence "
    "hashes into one of 512 buckets; bucket rates are Laplace-smoothed "
    "multinomials for the TARGET source vs the whole corpus, and each "
    "doc's importance log-weight is the sum of its occurrences' "
    "log-likelihood ratios — docs that look like the target domain score "
    "positive and survive the keep gate. Two corpus-linear passes over "
    "one persisted bucketed-gram stream: ONE 512-row rate aggregate "
    "(totals via a window on the dimension frame, not a second scan), "
    "ONE broadcastable rate join back + per-doc aggregate. Float rule: "
    "ln() over exact integer counts with identical operator order in "
    "both engines, per-term 8dp rounding + exact decimal sum (dsum), "
    "stable-rounded output — the doc_perplexity_bigram precedent. Docs "
    "with fewer than two tokens have no bigrams and drop out "
    "structurally in both engines.",
    tags=("curation", "quality", "sampling", "ngram", "pipeline"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("toks"),
        )
    )
    g = persist_tracked(
        docs.select(
            "doc_id",
            "source",
            F.explode(F.expr(ngram_expr(2))).alias("gram"),
        ).select(
            "doc_id", "source", (h64("gram", "dsir") % DSIR_BUCKETS).alias("b")
        )
    )
    r = g.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_c"),
        F.count(F.when(F.col("source") == DSIR_TARGET, True)).alias("n_t"),
    )
    # totals via an OVER () window on the 512-row dimension frame — no
    # second corpus scan and no 1-row crossJoin
    rt = r.select(
        "b",
        F.expr(
            _LOGR.format(B=DSIR_BUCKETS)
            .replace("tot_t", "sum(n_t) OVER ()")
            .replace("tot_c", "sum(n_c) OVER ()")
        ).alias("logr"),
    )
    j = g.join(rt, "b").select("doc_id", "logr")
    agg = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        dsum("logr", 8).alias("s"),
    )
    logw = round_stable(F.col("s"), 6)
    return agg.select("doc_id", "n_grams", logw.alias("logw"), (logw >= 0).alias("keep"))


# --------------------------------------------------------------------------
# bpe_fertility_by_source
# --------------------------------------------------------------------------


def _sql_fertility_oracle() -> str:
    return (
        _sql_bpe_chain()
        + f", wl AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_syms "
        f"FROM s{N_MERGES} GROUP BY word)"
        ", ws AS (SELECT source, unnest(list_filter(string_split(lower(text), ' '), "
        f"x -> regexp_matches(x, '{_WORD_RE}'))) AS word FROM documents) "
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words, "
        "CAST(SUM(n_syms) AS BIGINT) AS n_tokens, "
        + sql_round_stable("SUM(n_syms)::DOUBLE / COUNT(*)", 6)
        + " AS fertility FROM ws JOIN wl USING (word) GROUP BY source"
    )


@register(
    "bpe_fertility_by_source",
    oracle=_sql_fertility_oracle(),
    doc="Tokenizer APPLICATION: after bpe_merge_curve's N_MERGES trained "
    "merges (the SAME chain — bpe_merge_chain/_sql_bpe_chain are single-"
    "source in both engines), every word type carries a final spelling "
    "length; joining the vocab's spelling lengths back to the per-source "
    "word stream yields tokens-per-word (fertility) by source — the "
    "domain-level tokenizer-health metric read before committing a vocab "
    "(a domain whose fertility stays near characters-per-word is being "
    "tokenized badly). Encoding is a VOCAB join, not a corpus re-parse: "
    "the corpus-linear word stream joins the word-type dimension frame "
    "(AQE-broadcastable), so applying the tokenizer costs one scan + one "
    "bounded join at any corpus size. Cross-family reconciliation: "
    "sum(n_tokens) over sources == the curve's final total_syms "
    "(tests/test_round15q.py).",
    tags=("curation", "tokenize_char", "pipeline", "agg_sum_by_key"),
)
def bpe_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan truncation (guide §3.3) + loop elision on repeats: the trained
    # vocab's spelling lengths are a bounded DIMENSION frame (|word types|
    # rows), but deriving it replays the whole bpe_merge_chain driver loop
    # (4 argmax collects + stat collects, ~20 Spark jobs and a 522-Exchange
    # analyzed tree per build — measured 3.0 s of build time per bench
    # repeat). checkpoint_shared memoizes one lazy leaf per family visit:
    # the first build pays the training loop once, siblings/repeats plan
    # against the leaf. The corpus-side word stream + fertility aggregate
    # (the query's actual scale work) still run per repeat. The r11 BPE
    # checkpoint regression does not apply: that leaf sat INSIDE the merge
    # loop and dropped the word-hash partitioning each iteration re-used;
    # this one is the loop's final product, consumed by a plain join.
    def _wl() -> DataFrame:
        syms, _ = bpe_merge_chain(spark, sf_dir)
        return syms.groupBy("word").agg(
            F.count(F.lit(1)).cast("long").alias("n_syms")
        )

    wl = checkpoint_shared("r15.bpe_wl", sf_dir, _wl)
    docs = spread(load_table(spark, sf_dir, "documents").select("source", "text"))
    ws = docs.select(
        "source",
        F.explode(F.expr("filter(split(lower(text), ' '), x -> x <> '')")).alias(
            "word"
        ),
    ).filter(F.col("word").rlike(_WORD_RE))
    return (
        ws.join(wl, "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_tokens"),
            round_stable(
                F.sum("n_syms").cast("double") / F.count(F.lit(1)), 6
            ).alias("fertility"),
        )
    )


# --------------------------------------------------------------------------
# streaming_dedup_docs
# --------------------------------------------------------------------------


@register(
    "streaming_dedup_docs",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks "
        "FROM documents), "
        f"g AS (SELECT doc_id, md5(array_to_string(toks[1:{ES_K}], ' ')) AS h "
        f"FROM t WHERE len(toks) >= {ES_K}) "
        "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS keeper_id, "
        "doc_id <> MIN(doc_id) OVER (PARTITION BY h) AS is_dup FROM g"
    ),
    doc="Stateful STREAMING ingest dedup — the streaming twin of the "
    "prefix-boilerplate dedup family: documents stream through "
    "applyInPandasWithState keyed by the md5 of their first ES_K=12 "
    "whitespace tokens (dedup_canonical_quality's group key, byte-"
    "identical construction), the per-group state is ONE long (the "
    "minimum doc_id seen so far), and every arriving doc is append-"
    "emitted with its keeper attribution and a dup flag. Under an "
    "availableNow replay each group arrives as one batch, so keeper == "
    "the global group MIN — the batch/oracle semantics; on a live stream "
    "the contract is first-seen-wins (append mode cannot retract an "
    "already-emitted keeper), exactly how production ingest dedup "
    "behaves. Group-key hashing runs JVM-side before the Arrow hop; "
    "state is |groups| longs at any corpus size. Docs shorter than 12 "
    "tokens have no prefix group and drop out structurally (both "
    "engines). Reconciliation: dup counts equal dedup_canonical_quality's "
    "n_dropped totals over the same groups (tests/test_round15q.py).",
    tags=("streaming", "dedup", "curation", "agg_last_per_key"),
    bench=False,
)
def streaming_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_stats import documents_stream, run_available_now

    docs = documents_stream(spark, sf_dir)
    toks = F.expr("filter(split(lower(text), ' '), x -> x <> '')")
    # Filter BEFORE the projection drops `text` (round-9 ADVICE): the
    # predicate must sit where its input column still exists, not lean on
    # the analyzer reaching back into the child plan.
    t = docs.filter(F.size(toks) >= ES_K).select(
        F.md5(F.expr(
            f"array_join(slice(filter(split(lower(text), ' '), x -> x <> ''), 1, {ES_K}), ' ')"
        )).alias("h"),
        "doc_id",
    )

    def update(key, pdfs, state):
        import pandas as pd  # executor-side only

        prev = state.get[0] if state.exists else None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        mn = int(pdf["doc_id"].min())
        keeper = mn if prev is None else min(int(prev), mn)
        state.update((int(keeper),))
        ids = pdf["doc_id"].astype("int64")
        yield pd.DataFrame(
            {"doc_id": ids, "keeper_id": keeper, "is_dup": ids != keeper}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    out = t.groupBy("h").applyInPandasWithState(
        update,
        "doc_id long, keeper_id long, is_dup boolean",
        "keeper long",
        "append",
        GroupStateTimeout.NoTimeout,
    )
    return run_available_now(out, output_mode="append")


# --------------------------------------------------------------------------
# multimodal_bmp_resize
# --------------------------------------------------------------------------

RESIZE_W = 3
RESIZE_H = 2

#: Source dims are doc_id-derived (operators/multimodal._bmp_dims):
#: w = 4 + doc_id % 4, h = 2 + doc_id % 3. Nearest-neighbor source index
#: for target (x2, y2): (x2*w // RESIZE_W, y2*h // RESIZE_H).
_SQL_RESIZE_PX = (
    f"list_sum(list_transform(range({RESIZE_H}), y2 -> "
    f"list_sum(list_transform(range({RESIZE_W}), x2 -> "
    "(doc_id + 3 * ((x2 * (4 + doc_id % 4)) // {W2}) "
    "+ 7 * ((y2 * (2 + doc_id % 3)) // {H2})) % 256 "
    "+ (doc_id * 2 + ((x2 * (4 + doc_id % 4)) // {W2}) "
    "+ ((y2 * (2 + doc_id % 3)) // {H2})) % 256 "
    "+ (((x2 * (4 + doc_id % 4)) // {W2}) "
    "* ((y2 * (2 + doc_id % 3)) // {H2}) + doc_id) % 256))))"
).format(W2=RESIZE_W, H2=RESIZE_H)


@register(
    "multimodal_bmp_resize",
    oracle=(
        f"SELECT doc_id, CAST({RESIZE_W} AS BIGINT) AS width, "
        f"CAST({RESIZE_H} AS BIGINT) AS height, "
        f"CAST({_SQL_RESIZE_PX} AS BIGINT) AS px_sum FROM documents"
    ),
    doc="REAL image RESIZE round trip, no external libs (the transform leg "
    "of the multimodal brief): per doc the genuine 24-bit BMP payload "
    "(synth_bmp_payloads) is parsed byte-for-byte, nearest-neighbor "
    "resampled to 3x2 in image coordinates, re-encoded as a VALID "
    "bottom-up padded BMP of the new geometry (operators/"
    "multimodal_resize.resize_bmp_nn), and then read back by the ordinary "
    "decoder (decode_bmp_stats) — dims + RGB sum checked against the "
    "pattern's closed form under the floor NN index map. Whole chain is "
    "three Arrow-batched mapInPandas stages over the binary column: "
    "zero shuffle, corpus-linear, the exact plumbing a 100 TB image "
    "pipeline needs (schema, partitioning, batch shape) with the codec "
    "math real.",
    tags=("multimodal",),
)
def multimodal_bmp_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_bmp_stats, synth_bmp_payloads
    from ..operators.multimodal_resize import resize_bmp_nn

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_bmp_stats(
        resize_bmp_nn(synth_bmp_payloads(docs), RESIZE_W, RESIZE_H)
    )


# --------------------------------------------------------------------------
# epoch_schedule_budget
# --------------------------------------------------------------------------

EPOCH_BUDGET_X = 3   # train-token budget = 3x the unique corpus tokens
EPOCH_MAX = 2.5      # per-source epoch cap (data-constrained scaling rule)


@register(
    "epoch_schedule_budget",
    oracle=(
        "WITH d AS (SELECT source, "
        "len(list_filter(string_split(lower(text), ' '), x -> x <> '')) "
        "AS n_tok FROM documents), "
        "tot AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS m FROM d "
        "GROUP BY source), "
        "w AS (SELECT source, m, "
        + _sql_alpha_w(0.5, "m")
        + " AS w FROM tot), "
        "den AS (SELECT "
        + sql_dsum("w", 6)
        + " AS denom, CAST(SUM(m) AS BIGINT) AS total FROM w), "
        "s AS (SELECT source, m, "
        + sql_round_stable("w / denom", 6)
        + f" AS share, total FROM w CROSS JOIN den), "
        "a AS (SELECT source, m, share, "
        + sql_round_stable(f"share * (total * {EPOCH_BUDGET_X})", 2)
        + " AS alloc_tokens FROM s), "
        "e AS (SELECT source, m, share, alloc_tokens, "
        + sql_round_stable("alloc_tokens / m", 6)
        + " AS epochs_raw FROM a) "
        f"SELECT source, m, share, alloc_tokens, epochs_raw, "
        f"LEAST(epochs_raw, {EPOCH_MAX}) AS epochs, "
        + sql_round_stable(f"GREATEST(0.0, alloc_tokens - {EPOCH_MAX} * m)", 2)
        + " AS overflow_tokens FROM e"
    ),
    doc="Data-constrained epoch scheduling (the 'repeat data under a token "
    "budget' view): with a train budget of 3x the unique corpus tokens "
    "allocated by temperature-mixed shares (alpha=0.5, the shared "
    "_sql_alpha_w/round12q weight discipline), each source's allocation "
    "implies an epoch count; epochs are capped (2.5) and the overflow "
    "that must be reallocated is reported per source — the schedule a "
    "data-constrained training run reads to decide how often each domain "
    "repeats. Pure dimension-frame arithmetic after ONE corpus-linear "
    "token count: |sources| rows, one shuffle, every float stable-rounded "
    "at the stage boundaries so the schedule is bit-identical cross-"
    "engine.",
    tags=("curation", "sampling", "pipeline"),
)
def epoch_schedule_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import dsum as _dsum

    docs = spread(load_table(spark, sf_dir, "documents").select("source", "text"))
    tot = docs.select(
        "source",
        F.size(F.expr("filter(split(lower(text), ' '), x -> x <> '')"))
        .cast("long")
        .alias("n_tok"),
    ).groupBy("source").agg(F.sum("n_tok").cast("long").alias("m"))
    w = tot.select(
        "source", "m", round_stable(F.sqrt(F.col("m").cast("double")), 6).alias("w")
    )
    den = w.groupBy().agg(
        _dsum(F.col("w"), 6).alias("denom"), F.sum("m").cast("long").alias("total")
    )
    s = w.crossJoin(F.broadcast(den)).select(
        "source", "m", round_stable(F.col("w") / F.col("denom"), 6).alias("share"),
        "total",
    )
    a = s.select(
        "source", "m", "share",
        round_stable(F.col("share") * (F.col("total") * EPOCH_BUDGET_X), 2).alias(
            "alloc_tokens"
        ),
    )
    e = a.withColumn("epochs_raw", round_stable(F.col("alloc_tokens") / F.col("m"), 6))
    return e.select(
        "source", "m", "share", "alloc_tokens", "epochs_raw",
        F.least(F.col("epochs_raw"), F.lit(EPOCH_MAX)).alias("epochs"),
        round_stable(
            F.greatest(F.lit(0.0), F.col("alloc_tokens") - EPOCH_MAX * F.col("m")), 2
        ).alias("overflow_tokens"),
    )


# --------------------------------------------------------------------------
# streaming_dedup_state_probe
# --------------------------------------------------------------------------

#: Per-ROW minhash signature + banding, as one whole-stage-codegen SQL
#: expression over the token array — the STREAMABLE formulation (no groupBy,
#: so it runs inside an append-mode stream with zero aggregation state).
#: Bit-identical to operators/similarity.minhash_signatures/lsh_bands: same
#: '{seed}:{shingle}' md5-60bit mins (functions/hashing.h64), same seed-order
#: '-'-joined md5 band signature.


def _row_sig_col():
    """16-element minhash signature array as ONE per-row Column over the
    shingle array column ``sh`` (duplicates fine under MIN) — h64 is the
    package's cross-engine seeded md5-60bit hash."""
    from .round14q import SC_HASHES

    def _seeded_min(s: int):
        # NOTE: a `lambda x, s=s:` two-parameter form would make pyspark
        # bind the second param to the ELEMENT INDEX (its (el, idx) lambda
        # protocol) — the seed must be closed over via a factory instead.
        return F.array_min(F.transform(F.col("sh"), lambda x: h64(x, s)))

    return F.array(*[_seeded_min(s) for s in range(SC_HASHES)])


def _row_bands_expr(sig_col: str = "sig") -> str:
    from .round14q import SC_HASHES, SC_ROWS

    n_bands = SC_HASHES // SC_ROWS
    bands = ", ".join(
        f"struct(CAST({b} AS BIGINT) AS band, md5(concat_ws('-', "
        + ", ".join(
            f"CAST(element_at({sig_col}, {b * SC_ROWS + r + 1}) AS STRING)"
            for r in range(SC_ROWS)
        )
        + ")) AS band_sig)"
        for b in range(n_bands)
    )
    return f"array({bands})"


def _sig_band_frame(df: DataFrame) -> DataFrame:
    """(doc_id, sig, band, band_sig) per-row from (doc_id, text) — shared by
    the static state side and the streaming delta side (twin contract)."""
    toks = df.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("toks"),
    )
    sh = toks.select("doc_id", F.expr(ngram_expr(3)).alias("sh")).filter(
        F.size("sh") > 0
    )
    sig = sh.select("doc_id", _row_sig_col().alias("sig"))
    return sig.select(
        "doc_id", "sig", F.explode(F.expr(_row_bands_expr())).alias("bb")
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.band_sig").alias("band_sig"))


def _sql_state_probe_oracle() -> str:
    from .round14q import _SQL_SC_HEAD, _sql_scored, SC_MIN_AGREE

    return (
        f"WITH {_SQL_SC_HEAD},"
        " cand_s AS (SELECT DISTINCT d.doc_id AS doc_d, s.doc_id AS doc_s"
        " FROM bands d JOIN bands s USING (band, band_sig)"
        " WHERE d.doc_id % 2 = 1 AND s.doc_id % 2 = 0),"
        f" sc_s AS ({_sql_scored('cand_s', 'doc_d', 'doc_s')})"
        " SELECT doc_d, doc_s, CAST(n_agree AS BIGINT) AS n_agree"
        f" FROM sc_s WHERE n_agree >= {SC_MIN_AGREE}"
    )


@register(
    "streaming_dedup_state_probe",
    oracle=_sql_state_probe_oracle(),
    doc="STREAM-STATIC dedup probe — the streaming twin of "
    "dedup_state_compaction's state-match stage and the catalog's "
    "stream-static join: the delta (odd doc_ids) STREAMS while the "
    "accumulated canonical state's LSH band index (even doc_ids) is a "
    "static batch frame joined into every micro-batch. The stream side "
    "uses the per-ROW minhash formulation (16 seeded mins + 4 band md5s "
    "as ONE codegen expression over the token array — no aggregation, so "
    "append mode needs no watermark and no state beyond the pair dedupe), "
    "bit-identical to the aggregate-based operators/similarity chain; "
    "signature agreement verifies candidates per-row via zip_with on the "
    "two signature arrays — the verify join of the batch twin collapsed "
    "into the band join itself. Emits every verified (delta doc, state "
    "canonical, n_agree) pair; oracle is the batch twin's verified "
    "state-match pair set, byte-same CTE text. At 100 TB the state index "
    "is the only non-stream operand — exactly the shape of a production "
    "ingest pipeline probing yesterday's index.",
    tags=("streaming", "dedup", "minhash_sig", "lsh_band", "pipeline"),
    bench=False,
)
def streaming_dedup_state_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_stats import documents_stream, run_available_now
    from .round14q import SC_MIN_AGREE

    state = _sig_band_frame(
        spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
        .filter(F.col("doc_id") % 2 == 0)
    ).select(
        F.col("doc_id").alias("doc_s"),
        F.col("sig").alias("sig_s"),
        "band",
        "band_sig",
    )
    delta = _sig_band_frame(
        documents_stream(spark, sf_dir).filter(F.col("doc_id") % 2 == 1)
    ).select(
        F.col("doc_id").alias("doc_d"), F.col("sig").alias("sig_d"), "band", "band_sig"
    )
    j = delta.join(state, ["band", "band_sig"])  # stream-static equi-join
    pairs = j.select(
        "doc_d",
        "doc_s",
        F.expr(
            "CAST(size(filter(zip_with(sig_d, sig_s, (a, b) -> a = b), x -> x)) AS BIGINT)"
        ).alias("n_agree"),
    ).filter(F.col("n_agree") >= SC_MIN_AGREE)
    out = pairs.dropDuplicates(["doc_d", "doc_s"])
    return run_available_now(out, output_mode="append")
