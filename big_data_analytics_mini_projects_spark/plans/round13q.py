"""Round-9-budget forward batch #1 (authored in round 8; registered at the
catalog TAIL so the round-8 driver window is untouched — ROUND_QUEUE.md).

Three queries extending the tokenizer-training / mixing / quality families:

- ``streaming_mix_shares``  — stateful streaming twin of round12q's
  temperature_mix_rates: per-source cumulative token totals through
  applyInPandasWithState (one long per domain), the alpha-sweep share
  computation re-derived on the emitted dimension frame. Completes the
  batch<->stream twin pattern for the mixing family; shares the oracle
  text verbatim (plans/shared.sql_temperature_oracle).
- ``bpe_merge_curve``       — MULTI-merge BPE tokenizer-training
  convergence curve (the lloyd_convergence_curve shape on bpe_merge_step,
  round6q): four full merge iterations — pair counting, greedy-leftmost
  merge application, vocabulary compression tracking — run RELATIONALLY on
  the word-type frame. ROUND_QUEUE flagged Spark-vs-DuckDB
  regexp_replace greedy-parity as the risk here; this design eliminates
  the regex entirely: the greedy leftmost-non-overlapping merge is a
  gaps-and-islands window computation (dedup_exact_substring's trick),
  identical integer logic in both engines — RE2's missing lookarounds
  never enter the picture.
- ``repetition_quality_rules`` — per-document repetition quality gates
  (the MassiveText/Gopher rule family): top-word character share,
  duplicate-word fraction, duplicate-2gram character share, composite
  keep flag. Exact integer numerators/denominators, one stable-rounded
  division per ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, Window, functions as F

from ..caching import checkpoint_shared, persist_tracked
from ..functions.hashing import h64, h64_sql
from ..functions.text import round_stable, sql_round_stable
from ..sources.tables import load_table, spread
from .registry import register
from .shared import (
    _W_AVGLEN,
    _W_BIAS,
    _W_NTOK,
    _W_STOP,
    ES_K,
    mix_shares_frame,
    span_col,
    sql_temperature_oracle,
)

# --------------------------------------------------------------------------
# streaming_mix_shares
# --------------------------------------------------------------------------


@register(
    "streaming_mix_shares",
    oracle=sql_temperature_oracle(),
    doc="Stateful STREAMING twin of temperature_mix_rates: the corpus "
    "streams through applyInPandasWithState keeping ONE cumulative token "
    "counter per source (stream_stats.stream_source_token_totals), and the "
    "alpha = 1/0.5/0.25 share sweep re-derives on the emitted per-source "
    "totals — a dimension-scale computation, so each micro-batch of a live "
    "stream yields a refreshed share snapshot (the per-batch mix-drift "
    "monitor a temperature-sampled training pipeline watches as sources "
    "grow at different rates). Over an availableNow run the whole table is "
    "one batch, so output == the batch twin bit-for-bit (shared oracle "
    "text). Tokenization runs JVM-side before the Arrow hop; state is "
    "|sources| longs at any corpus size.",
    tags=("streaming", "curation", "sampling", "pipeline"),
    bench=False,
)
def streaming_mix_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_stats import (
        documents_stream,
        run_available_now,
        stream_source_token_totals,
    )

    totals = run_available_now(
        stream_source_token_totals(documents_stream(spark, sf_dir)),
        output_mode="append",
    )
    # The stateful head append-emits one refreshed cumulative total per
    # source PER MICRO-BATCH it appears in; mix_shares_frame needs exactly
    # one row per source. Under availableNow over the single-file documents
    # source that is already true, but a multi-batch replay (e.g. a
    # maxFilesPerTrigger source) would emit several — reduce to the LAST
    # emission (the counter is cumulative, so max(m) == final total) instead
    # of relying on the single-batch contract (round-8 ADVICE).
    final_totals = totals.groupBy("source").agg(F.max("m").alias("m"))
    return mix_shares_frame(final_totals)


# --------------------------------------------------------------------------
# bpe_merge_curve
# --------------------------------------------------------------------------

#: Merge iterations of the convergence curve. Four is enough to cross at
#: least one vocabulary-composition change (merged symbols competing with
#: raw pairs) at every driver SF.
N_MERGES = 4

#: Word filter: alphanumeric-only word types keep every merged symbol free
#: of regex/SQL metacharacters and whitespace, so the pair key 'a b' (space-
#: joined) is unambiguous in both engines.
_WORD_RE = "^[a-z0-9]+$"


def _sql_bpe_chain(iters: int = N_MERGES) -> str:
    """Unrolled DuckDB CTE chain 'WITH w, s0, (n,pc,b,m,i,c,d,s,r){1..N}'
    WITHOUT a final SELECT: per iteration, the pair-count aggregate, the
    (cnt DESC, a ASC, b ASC) argmax as scalar subqueries, the gaps-and-
    islands greedy-leftmost merge, and the freq-weighted stats row. Shared
    by bpe_merge_curve's oracle (stats-row tail) and round15q's fertility
    oracle (final-spelling tail over s{N}) — the SQL twin of
    bpe_merge_chain.

    The multiply-referenced CTEs (each s{t} feeds the next iteration AND
    the stats row; each b{t} is read by five scalar subqueries) carry AS
    MATERIALIZED: without it DuckDB inlines the whole s{t} window chain
    into every reference and the unrolled query re-evaluates the corpus
    scan exponentially in the iteration count (measured 15 s -> sub-second
    at sf0.001; the ols_words_pvalues lesson)."""
    head = (
        "WITH w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM ("
        "SELECT unnest(list_filter(string_split(lower(text), ' '), "
        f"x -> regexp_matches(x, '{_WORD_RE}'))) AS word FROM documents) "
        "GROUP BY word), "
        "s0 AS MATERIALIZED (SELECT word, freq, pos, "
        "substr(word, CAST(pos AS INT) + 1, 1) AS sym "
        "FROM (SELECT word, freq, unnest(range(length(word))) AS pos FROM w))"
    )
    steps = []
    for t in range(1, iters + 1):
        p = t - 1
        steps.append(
            f", n{t} AS (SELECT word, freq, pos, sym, "
            f"lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM s{p})"
            f", pc{t} AS (SELECT sym AS a, nxt AS b, "
            f"CAST(SUM(freq) AS BIGINT) AS cnt FROM n{t} "
            "WHERE nxt IS NOT NULL GROUP BY a, b)"
            f", b{t} AS MATERIALIZED (SELECT a, b, cnt FROM pc{t} "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)"
            f", m{t} AS (SELECT word, freq, pos, sym, nxt, "
            f"(nxt IS NOT NULL AND sym = (SELECT a FROM b{t}) "
            f"AND nxt = (SELECT b FROM b{t})) AS mk FROM n{t})"
            f", i{t} AS (SELECT *, pos - row_number() OVER "
            f"(PARTITION BY word, mk ORDER BY pos) AS isl FROM m{t})"
            f", c{t} AS (SELECT *, mk AND ((pos - MIN(pos) OVER "
            "(PARTITION BY word, mk, isl)) % 2 = 0) AS ch "
            f"FROM i{t})"
            f", d{t} AS MATERIALIZED (SELECT *, lag(ch) OVER "
            f"(PARTITION BY word ORDER BY pos) AS pch FROM c{t})"
            f", s{t} AS MATERIALIZED (SELECT word, freq, row_number() OVER "
            "(PARTITION BY word ORDER BY pos) - 1 AS pos, "
            "CASE WHEN ch THEN sym || nxt ELSE sym END AS sym "
            f"FROM d{t} WHERE NOT COALESCE(pch, FALSE))"
            f", r{t} AS (SELECT CAST({t} AS BIGINT) AS iteration, "
            f"(SELECT a FROM b{t}) || ' ' || (SELECT b FROM b{t}) AS pair, "
            f"(SELECT cnt FROM b{t}) AS pair_count, "
            f"(SELECT CAST(COALESCE(SUM(freq), 0) AS BIGINT) FROM d{t} WHERE ch) "
            "AS merged_occ, "
            f"(SELECT CAST(SUM(freq) AS BIGINT) FROM s{t}) AS total_syms)"
        )
    return head + "".join(steps)


def _sql_bpe_oracle(iters: int = N_MERGES) -> str:
    tail = " " + " UNION ALL ".join(
        f"SELECT * FROM r{t}" for t in range(1, iters + 1)
    )
    return _sql_bpe_chain(iters) + tail


@register(
    "bpe_merge_curve",
    oracle=_sql_bpe_oracle(),
    doc="BPE tokenizer-training convergence curve: four FULL merge "
    "iterations (pair counting -> argmax merge selection -> greedy "
    "leftmost-non-overlapping application -> vocabulary re-spelling), "
    "tracking per iteration the chosen pair, its raw adjacency count, the "
    "freq-weighted number of merges actually applied, and the remaining "
    "freq-weighted symbol total (the compression curve a tokenizer "
    "trainer watches for diminishing returns). Scale design: ONE corpus-"
    "linear shuffle builds the word-type/frequency vocabulary; every "
    "iteration after that runs on the vocab x symbol frame (dimension "
    "scale — bounded by total vocabulary characters, not corpus tokens): "
    "one vocab-keyed pair aggregate, three word-partitioned windows, and "
    "a 1-row driver collect for the argmax (the momentum_gd bounded-"
    "scalar class, 2 rows x 4 iterations total). Greedy application is "
    "regex-free — leftmost-non-overlapping occurrences are selected with "
    "the gaps-and-islands window trick (runs of a self-pair like 'a a a a' "
    "merge at even island offsets), so cross-engine parity needs no "
    "regexp_replace semantics at all (RE2 has no lookarounds; the "
    "ROUND_QUEUE risk note). All outputs are exact integers.",
    tags=("curation", "tokenize_char", "iterative", "pipeline"),
)
def bpe_merge_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, rows = bpe_merge_chain(spark, sf_dir)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def bpe_merge_chain(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> tuple[DataFrame, list[DataFrame]]:
    """The shared BPE merge-training loop: returns (the word-type symbol
    frame AFTER the final merge, the per-iteration 1-row stat frames).
    Single source for bpe_merge_curve (stats) and round15q's fertility view
    (final spellings) — both engines' chains stay byte-reconciled because
    the SQL twin (_sql_bpe_chain) is shared the same way.

    Driver-job census (guide §1.5/§2.6, tightened round 12): the loop
    collects ONLY the per-iteration argmax (the value that steers the next
    merge — irreducibly sequential). The merged-occurrence and symbol-total
    stats ride as LAZY 1-row aggregates over the persisted step frames, so
    they are computed by the consumer's single action instead of 2n_merges+1
    extra driver jobs per build (4 jobs/build instead of 9 at N_MERGES=4)."""
    docs = spread(load_table(spark, sf_dir, "documents").select("text"))
    words = docs.select(
        F.explode(F.expr("filter(split(lower(text), ' '), x -> x <> '')")).alias(
            "word"
        )
    ).filter(F.col("word").rlike(_WORD_RE))
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    syms = vocab.select(
        "word",
        "freq",
        F.posexplode(
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        ).alias("pos", "sym"),
    ).select("word", "freq", F.col("pos").cast("long").alias("pos"), "sym")
    # Measured note (optimization round 11): replacing these per-iteration
    # persists with checkpoint_shared leaves was TRIED and ran ~15% slower —
    # the checkpoint leaf drops the word-hash partitioning the persisted
    # window output carries, so every iteration re-exchanges by word. The
    # persists stay.
    syms = persist_tracked(syms)

    w_word = Window.partitionBy("word").orderBy("pos")

    rows: list[DataFrame] = []
    for t in range(1, n_merges + 1):
        n = syms.withColumn("nxt", F.lead("sym").over(w_word))
        best_rows = (
            n.filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("sym"), F.asc("nxt"))
            .limit(1)
            .collect()
        )
        if not best_rows:
            # Degenerate corpus: every word already collapsed to one symbol,
            # so there are no adjacent pairs left. The unrolled oracle's
            # scalar subqueries over the empty b{t} CTE yield NULL pair/
            # pair_count, zero merged occurrences, and an unchanged symbol
            # total — emit the matching row instead of raising (round-8
            # ADVICE; unreachable at the shipped SFs, pinned by a fixture
            # test). The symbol total is a lazy aggregate over the CURRENT
            # syms frame (= the running total; no pairs means no change).
            rows.append(
                syms.agg(F.sum("freq").cast("long").alias("total_syms")).select(
                    F.lit(t).cast("long").alias("iteration"),
                    F.lit(None).cast("string").alias("pair"),
                    F.lit(None).cast("long").alias("pair_count"),
                    F.lit(0).cast("long").alias("merged_occ"),
                    "total_syms",
                )
            )
            continue
        best = best_rows[0]
        a, b, cnt = best["sym"], best["nxt"], int(best["cnt"])
        m = n.withColumn(
            "mk",
            F.col("nxt").isNotNull() & (F.col("sym") == a) & (F.col("nxt") == b),
        )
        i = m.withColumn(
            "isl",
            F.col("pos")
            - F.row_number().over(Window.partitionBy("word", "mk").orderBy("pos")),
        )
        c = i.withColumn(
            "ch",
            F.col("mk")
            & (
                (
                    F.col("pos")
                    - F.min("pos").over(Window.partitionBy("word", "mk", "isl"))
                )
                % 2
                == 0
            ),
        )
        d = checkpoint_shared(
            f"r13.bpe_d{t}",
            sf_dir,
            lambda c=c: persist_tracked(c.withColumn("pch", F.lag("ch").over(w_word))),
        )
        syms = checkpoint_shared(
            f"r13.bpe_syms{t}",
            sf_dir,
            lambda d=d, a=a, b=b: persist_tracked(
                d.filter(~F.coalesce(F.col("pch"), F.lit(False)))
                .select(
                    "word",
                    "freq",
                    (F.row_number().over(w_word) - 1).cast("long").alias("pos"),
                    F.when(F.col("ch"), F.lit(a + b)).otherwise(
                        F.col("sym")
                    ).alias("sym"),
                )
            ),
        )
        # lazy stats over the persisted step frames: merged_occ from d's
        # applied-merge rows, the post-merge symbol total from syms —
        # the consumer's one action computes both (no per-iteration collect)
        mrow = d.filter("ch").agg(
            F.coalesce(F.sum("freq"), F.lit(0)).cast("long").alias("merged_occ")
        )
        trow = syms.agg(F.sum("freq").cast("long").alias("total_syms"))
        rows.append(
            mrow.crossJoin(F.broadcast(trow)).select(
                F.lit(t).cast("long").alias("iteration"),
                F.lit(f"{a} {b}").alias("pair"),
                F.lit(cnt).cast("long").alias("pair_count"),
                "merged_occ",
                "total_syms",
            )
        )
    return syms, rows


# --------------------------------------------------------------------------
# repetition_quality_rules
# --------------------------------------------------------------------------

#: Gopher/MassiveText-style repetition gates (thresholds are the published
#: rule family's shape; exact values tuned to the synthetic corpus).
TOP_WORD_MAX = 0.20
DUP_WORD_MAX = 0.30
DUP_2GRAM_MAX = 0.20


@register(
    "repetition_quality_rules",
    oracle=(
        "WITH t AS (SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), "
        "x -> x <> '')) AS word FROM documents), "
        "wc AS (SELECT doc_id, word, COUNT(*) AS c FROM t GROUP BY doc_id, word), "
        "agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words, "
        "CAST(COUNT(*) AS BIGINT) AS n_distinct, "
        "CAST(SUM(c * length(word)) AS BIGINT) AS n_chars FROM wc GROUP BY doc_id), "
        "top AS (SELECT doc_id, c * length(word) AS top_chars FROM ("
        "SELECT doc_id, word, c, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY c DESC, word ASC) AS rk FROM wc) WHERE rk = 1), "
        "tarr AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), "
        "x -> x <> '') AS toks FROM documents), "
        "g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), "
        "i -> array_to_string(toks[i:i+1], ' '))) AS gram FROM tarr "
        "WHERE len(toks) >= 2), "
        "gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram), "
        "g AS (SELECT doc_id, "
        "CAST(SUM(CASE WHEN c > 1 THEN c * length(gram) ELSE 0 END) AS BIGINT) "
        "AS dup2_chars, "
        "CAST(SUM(c * length(gram)) AS BIGINT) AS tot2_chars "
        "FROM gc GROUP BY doc_id) "
        "SELECT agg.doc_id, agg.n_words, agg.n_words - agg.n_distinct AS n_dup_words, "
        + sql_round_stable(
            "CAST(top.top_chars AS DOUBLE) / agg.n_chars", 6
        )
        + " AS top_word_frac, "
        + sql_round_stable(
            "CAST(agg.n_words - agg.n_distinct AS DOUBLE) / agg.n_words", 6
        )
        + " AS dup_word_frac, "
        + sql_round_stable("CAST(g.dup2_chars AS DOUBLE) / g.tot2_chars", 6)
        + " AS dup_2gram_frac, "
        f"({sql_round_stable('CAST(top.top_chars AS DOUBLE) / agg.n_chars', 6)}"
        f" <= {TOP_WORD_MAX} AND "
        f"{sql_round_stable('CAST(agg.n_words - agg.n_distinct AS DOUBLE) / agg.n_words', 6)}"
        f" <= {DUP_WORD_MAX} AND "
        f"{sql_round_stable('CAST(g.dup2_chars AS DOUBLE) / g.tot2_chars', 6)}"
        f" <= {DUP_2GRAM_MAX}) AS keep "
        "FROM agg JOIN top ON agg.doc_id = top.doc_id "
        "JOIN g ON agg.doc_id = g.doc_id"
    ),
    doc="Per-document repetition quality gates (the MassiveText/Gopher "
    "filter-rule family): top-word character share (is one token "
    "dominating the doc), duplicate-word fraction (1 - type/token ratio, "
    "kept as an exact integer numerator), duplicate-2gram character share "
    "(boilerplate/templating signal), and the composite keep flag. Docs "
    "need >= 2 tokens (a 2gram must exist) — enforced structurally by the "
    "inner join against the 2gram frame, same semantics in the oracle. "
    "All three ratios are exact-integer numerator/denominator pushed "
    "through ONE stable-rounded division each, so the keep flag compares "
    "identically cross-engine. Scale: two corpus-linear explodes keyed by "
    "(doc_id, token) with map-side combine, per-doc windows bounded by "
    "per-doc vocabulary — no global state, trivially 100 TB-safe.",
    tags=("curation", "quality", "agg_count_by_key"),
)
def repetition_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("toks"),
    )
    words = toks.select("doc_id", F.explode("toks").alias("word"))
    wc = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    agg = wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("c") * F.length("word")).cast("long").alias("n_chars"),
    )
    top = (
        wc.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("word"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("doc_id", (F.col("c") * F.length("word")).alias("top_chars"))
    )
    g2 = toks.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(toks[i - 1], ' ', toks[i]))"
            )
        ).alias("gram"),
    )
    gc = g2.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    g = gc.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.length("gram")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("dup2_chars"),
        F.sum(F.col("c") * F.length("gram")).cast("long").alias("tot2_chars"),
    )
    top_frac = round_stable(
        F.col("top_chars").cast("double") / F.col("n_chars"), 6
    )
    dup_frac = round_stable(
        (F.col("n_words") - F.col("n_distinct")).cast("double") / F.col("n_words"), 6
    )
    dup2_frac = round_stable(
        F.col("dup2_chars").cast("double") / F.col("tot2_chars"), 6
    )
    return (
        agg.join(top, "doc_id")
        .join(g, "doc_id")
        .select(
            "doc_id",
            "n_words",
            (F.col("n_words") - F.col("n_distinct")).alias("n_dup_words"),
            top_frac.alias("top_word_frac"),
            dup_frac.alias("dup_word_frac"),
            dup2_frac.alias("dup_2gram_frac"),
            (
                (top_frac <= TOP_WORD_MAX)
                & (dup_frac <= DUP_WORD_MAX)
                & (dup2_frac <= DUP_2GRAM_MAX)
            ).alias("keep"),
        )
    )


# --------------------------------------------------------------------------
# span_novelty_scan
# --------------------------------------------------------------------------


@register(
    "span_novelty_scan",
    oracle=(
        "WITH tarr AS (SELECT doc_id, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks "
        "FROM documents), "
        f"sp AS (SELECT doc_id, unnest(range(0, len(toks) - {ES_K - 1})) AS pos, "
        "toks FROM tarr), "
        "sh AS (SELECT doc_id, "
        + h64_sql(f"array_to_string(toks[pos + 1:pos + {ES_K}], ' ')", "es")
        + " AS h FROM sp), "
        "dh AS (SELECT DISTINCT doc_id, h FROM sh), "
        "mult AS (SELECT h, COUNT(*) AS nd FROM dh GROUP BY h), "
        "j AS (SELECT sh.doc_id, CASE WHEN mult.nd > 1 THEN 1 ELSE 0 END AS mem "
        "FROM sh JOIN mult ON sh.h = mult.h) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, "
        "CAST(SUM(mem) AS BIGINT) AS n_memorized, "
        + sql_round_stable("1.0 - CAST(SUM(mem) AS DOUBLE) / COUNT(*)", 6)
        + " AS novelty_ratio "
        "FROM j GROUP BY doc_id"
    ),
    doc="Span-level memorization/novelty accounting (the eval-contamination "
    "and train-data-memorization audit view): every overlapping ES_K=12-"
    "token span of every document is hashed (the exact-substring dedup "
    "family's span stream, shared ES_K/seed so numbers line up with "
    "dedup_exact_substring), a span OCCURRENCE counts as memorized when "
    "its hash appears in at least one OTHER document, and each doc "
    "reports its span count, memorized-span count, and novelty ratio. "
    "Documents shorter than 12 tokens have no spans and drop out "
    "structurally (same semantics in both engines). Scale: one span "
    "explode (per-row transform, zero scatter — span_col), one distinct "
    "+ count per span hash, one hash-keyed equi-join back; everything is "
    "corpus-linear on the span stream, and the multi-doc flag frame is "
    "bounded by distinct spans. The novelty ratio is one exact-integer "
    "division, stable-rounded.",
    tags=("dedup", "curation", "quality", "agg_count_by_key"),
)
def span_novelty_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("toks"),
    )
    spans = toks.select(
        "doc_id", F.explode(span_col("toks", ES_K)).alias("span")
    ).select("doc_id", h64("span", "es").alias("h"))
    spans = persist_tracked(spans)
    mult = (
        spans.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    j = spans.join(mult, "h").select(
        "doc_id", F.when(F.col("nd") > 1, F.lit(1)).otherwise(F.lit(0)).alias("mem")
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("mem").cast("long").alias("n_memorized"),
        round_stable(
            F.lit(1.0) - F.sum("mem").cast("double") / F.count(F.lit(1)), 6
        ).alias("novelty_ratio"),
    )


# --------------------------------------------------------------------------
# doc_length_percentiles_by_source
# --------------------------------------------------------------------------

#: Percentiles as integer hundredths — rank = ceil(n*k/100) computed as
#: (n*k + 99) // 100, pure integer arithmetic in both engines (no float
#: quantile-interpolation semantics to reconcile: DuckDB's quantile_cont /
#: Spark's percentile interpolate differently, so neither is used).
PCTS = (25, 50, 75, 95)


@register(
    "doc_length_percentiles_by_source",
    oracle=(
        "WITH t AS (SELECT source, doc_id, "
        "len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tok "
        "FROM documents), "
        "r AS (SELECT source, n_tok, "
        "row_number() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS rn, "
        "COUNT(*) OVER (PARTITION BY source) AS n FROM t) "
        "SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs, "
        + ", ".join(
            f"CAST(MAX(CASE WHEN rn = (n * {k} + 99) // 100 THEN n_tok END) "
            f"AS BIGINT) AS p{k}"
            for k in PCTS
        )
        + " FROM r GROUP BY source"
    ),
    doc="Exact per-source document-length percentiles (p25/p50/p75/p95 of "
    "the whitespace token count) — the length-distribution profile a "
    "curation pipeline reads before setting min/max-length filters per "
    "source. Percentile semantics are the rank-based 'value at rank "
    "ceil(q*n)' definition computed in PURE INTEGER arithmetic "
    "((n*k + 99) div 100), because the engines' built-in continuous "
    "quantiles interpolate differently and would never hash-match. One "
    "rank window partitioned by source (bounded per-source state) + one "
    "conditional aggregate; corpus-linear, one shuffle, dimension-scale "
    "output.",
    tags=("quality", "curation", "window", "agg_count_by_key"),
)
def doc_length_percentiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents").select("source", "doc_id", "text"))
    t = docs.select(
        "source",
        "doc_id",
        F.size(F.expr("filter(split(lower(text), ' '), x -> x <> '')")).alias(
            "n_tok"
        ),
    )
    w = Window.partitionBy("source")
    r = t.select(
        "source",
        "n_tok",
        F.row_number().over(w.orderBy("n_tok", "doc_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return r.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        *[
            F.max(
                F.when(
                    F.col("rn") == F.expr(f"(n * {k} + 99) div 100"), F.col("n_tok")
                )
            )
            .cast("long")
            .alias(f"p{k}")
            for k in PCTS
        ],
    )


# --------------------------------------------------------------------------
# dedup_canonical_quality
# --------------------------------------------------------------------------


@register(
    "dedup_canonical_quality",
    oracle=(
        "WITH t AS (SELECT doc_id, text, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks "
        "FROM documents), "
        f"g AS (SELECT doc_id, text, md5(array_to_string(toks[1:{ES_K}], ' ')) "
        f"AS grp FROM t WHERE len(toks) >= {ES_K}), "
        "feats AS (SELECT doc_id, grp, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok, "
        "CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_wlen, "
        "CAST(len(regexp_extract_all(text, '\\bthe\\b')) AS BIGINT) AS n_stop "
        "FROM g), "
        f"w AS (SELECT {_W_BIAS}::DOUBLE AS w_bias, {_W_NTOK}::DOUBLE AS w_ntok, "
        f"{_W_AVGLEN}::DOUBLE AS w_avglen, {_W_STOP}::DOUBLE AS w_stop), "
        "s AS (SELECT doc_id, grp, "
        + sql_round_stable(
            "((w_bias + w_ntok * n_tok) + w_avglen * avg_wlen) + w_stop * n_stop", 6
        )
        + " AS score FROM feats CROSS JOIN w), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY grp "
        "ORDER BY score DESC, doc_id ASC) AS rk, "
        "COUNT(*) OVER (PARTITION BY grp) AS n, "
        "MIN(score) OVER (PARTITION BY grp) AS worst "
        "FROM s) "
        "SELECT grp, CAST(n AS BIGINT) AS n_docs, "
        "doc_id AS keeper, score AS keeper_score, "
        "CAST(n - 1 AS BIGINT) AS n_dropped, "
        + sql_round_stable("score - worst", 6)
        + " AS score_spread "
        "FROM r WHERE rk = 1 AND n > 1"
    ),
    doc="Quality-aware canonicalization of shared-opening boilerplate "
    "groups: docs whose first ES_K=12 whitespace tokens are identical "
    "(the prefix-blocking near-dup class — templated/boilerplate openings "
    "that exact-hash dedup misses because tails differ) are grouped by "
    "the prefix hash, and the KEEPER is the member with the best quality-"
    "classifier score (shared _W_* weights and feature expressions of "
    "quality_classifier_score, plans/privacyq.py) instead of dedup_exact's "
    "min-doc_id rule — what a real pipeline does: keep the best variant, "
    "drop the rest. Selection ranks by the 6-decimal stable-rounded score "
    "on BOTH engines (ties fall to doc_id ASC), so the argmax is cross-"
    "engine deterministic even at 1-ulp logit differences; score_spread "
    "(best - worst) quantifies what dropping costs. Docs shorter than 12 "
    "tokens have no prefix and drop out structurally. One map-side "
    "feature+hash pass with the broadcast 1-row weights frame, one group-"
    "keyed window — corpus-linear, one shuffle.",
    tags=("dedup", "curation", "quality", "window"),
)
def dedup_canonical_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    t = docs.select(
        "doc_id",
        "text",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("toks"),
    ).filter(F.size("toks") >= ES_K)
    feats = t.select(
        "doc_id",
        F.md5(F.expr(f"array_join(slice(toks, 1, {ES_K}), ' ')")).alias("grp"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
        (
            F.length("text").cast("double") / F.size(F.split(F.col("text"), " "))
        ).alias("avg_wlen"),
        F.regexp_count(F.col("text"), F.lit(r"\bthe\b")).cast("long").alias("n_stop"),
    )
    w = docs.sparkSession.range(1).select(
        F.lit(_W_BIAS).alias("w_bias"),
        F.lit(_W_NTOK).alias("w_ntok"),
        F.lit(_W_AVGLEN).alias("w_avglen"),
        F.lit(_W_STOP).alias("w_stop"),
    )
    z = (
        (F.col("w_bias") + F.col("w_ntok") * F.col("n_tok"))
        + F.col("w_avglen") * F.col("avg_wlen")
    ) + F.col("w_stop") * F.col("n_stop")
    s = feats.crossJoin(F.broadcast(w)).select(
        "doc_id", "grp", round_stable(z, 6).alias("score")
    )
    wh = Window.partitionBy("grp")
    r = s.select(
        "doc_id",
        "grp",
        "score",
        F.row_number()
        .over(wh.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rk"),
        F.count(F.lit(1)).over(wh).alias("n"),
        F.min("score").over(wh).alias("worst"),
    )
    return r.filter((F.col("rk") == 1) & (F.col("n") > 1)).select(
        "grp",
        F.col("n").cast("long").alias("n_docs"),
        F.col("doc_id").alias("keeper"),
        F.col("score").alias("keeper_score"),
        (F.col("n") - 1).cast("long").alias("n_dropped"),
        round_stable(F.col("score") - F.col("worst"), 6).alias("score_spread"),
    )
