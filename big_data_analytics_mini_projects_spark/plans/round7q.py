"""Round-6-authored queries for the round-7 driver window: the forward queue
of ROUND_QUEUE.md built early so the next rotation starts from tested code.

REGISTERED AT THE CATALOG TAIL (after every already-green module): the
round-6 driver window is the carefully planned stale-green rotation
(catalog.py tiers 1-7) and displacing any of it would defeat that round's
verdict items 2-3 — so these five queries take the historically normal
"never-verified until first rotation" path (exactly how the 13 TPC-H
completion shapes waited for round 5). They ARE covered by the local
differential gate (tests/test_catalog_oracle.py at sf0.001, the builder
sf0.01/sf0.1 sweep, and the 10x/100x ledger) from day one.

Contents (rounds out the ≤15 new-query budget of round 6 at 15):

- ``ann_ivf_nprobe``     — multi-cell IVF ANN (nprobe=3) over decimal-exact
                           per-cell centroids (ROUND_QUEUE round-7 item b).
- ``dedup_containment``  — doc-in-doc containment dedup (suffix/quotation
                           case Jaccard misses).
- ``domain_lang_drift``  — per-domain language-mix drift monitor (exact
                           integer-arithmetic total-variation distance).
- ``chunk_dedup_boilerplate`` — RefinedWeb-style repeated-passage removal
                           at sub-document (10-token chunk) granularity.
- ``streaming_token_budget`` — stateful streaming twin of
                           token_budget_sample (budget counter state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.hashing import h64, h64_sql
from ..functions.text import round_stable, sql_round_stable
from ..operators.similarity import containment_pairs, ngram_shingles
from ..operators.vector import cosine_topk_ivf
from ..sources.tables import load_table, spread
from .registry import register
from .shared import (
    SQL_TOKEN_BUDGET,
    SQL_VECS,
    TOKEN_BUDGET,
    embedding_vectors,
)

IVF_QUERIES = 5   # vec_id < 5 are the query vectors (same as the ANN family)
IVF_K = 10
IVF_NPROBE = 3    # of the 10 label cells

_SQL_COS_QE = (
    "list_dot_product(q.v, e.v) / "
    "(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v)))"
)

#: Centroids / probe-cell CTEs shared with the Spark twin expression-for-
#: expression: decimal-exact component means (VARCHAR bridge — see
#: operators/aggregates.sql_dsum), d2 via the same three dot products.
_SQL_IVF = f"""
{SQL_VECS},
comp AS (SELECT label, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS pos FROM e),
cm AS (SELECT label, pos,
       CAST(CAST(SUM(CAST(x AS DECIMAL(18,8))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
       FROM comp GROUP BY label, pos),
cent AS (SELECT label, list(m ORDER BY pos) AS cv FROM cm GROUP BY label),
q AS (SELECT vec_id, v FROM e WHERE vec_id < {IVF_QUERIES}),
qc AS (SELECT q.vec_id AS query_id, c.label AS cell,
       list_dot_product(q.v, q.v) - 2 * list_dot_product(q.v, c.cv)
       + list_dot_product(c.cv, c.cv) AS d2
       FROM q, cent c),
probes AS (SELECT query_id, cell FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY d2 ASC, cell ASC) AS pr FROM qc)
  WHERE pr <= {IVF_NPROBE}),
pairs AS (SELECT p.query_id, e.vec_id AS neighbor_id, {_SQL_COS_QE} AS cos
          FROM probes p
          JOIN e ON e.label = p.cell
          JOIN q ON q.vec_id = p.query_id
          WHERE e.vec_id <> p.query_id)
"""


@register(
    "ann_ivf_nprobe",
    oracle=(
        f"WITH {_SQL_IVF} "
        f"SELECT query_id, neighbor_id, rank, {sql_round_stable('cos', 6)} AS cos "
        "FROM (SELECT *, row_number() OVER (PARTITION BY query_id "
        "ORDER BY cos DESC, neighbor_id ASC) AS rank FROM pairs) "
        f"WHERE rank <= {IVF_K}"
    ),
    doc="Multi-cell IVF top-k (nprobe=3 of 10 cells): per-cell centroids as "
    "decimal-exact component means (posexplode -> cells x dim keyed "
    "aggregate, map-side combined), each query probes its 3 nearest cells "
    "by squared L2 to the centroid, candidates are an equi-join on the cell "
    "id. Recovers the across-cell-boundary neighbors probe-1 blocked search "
    "(ann_cosine_topk_blocked) misses at 3/10 of brute-force cost — the "
    "IVF recall/cost dial, complementing the SRP dial "
    "(ann_multiprobe_topk). Centroid and probe frames are broadcast-sized "
    "at any corpus scale; only the cell equi-join touches the corpus.",
    tags=("ann", "similarity_search"),
)
def ann_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = embedding_vectors(spark, sf_dir)
    out = cosine_topk_ivf(
        vecs, vecs.filter(F.col("vec_id") < IVF_QUERIES), IVF_K, nprobe=IVF_NPROBE
    )
    return out.select(
        "query_id", "neighbor_id", "rank", round_stable("cos", 6).alias("cos")
    )


CONT_TAU = 0.9   # containment floor: |A∩B| / |A| for the smaller set A
CONT_DF_CAP = 500

#: Same shingle/df-cap construction as similarityq's _SQL_SHINGLES (copied,
#: not imported: a plans-module import would reorder the catalog contract).
_SQL_CONT = f"""
tarr AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
         FROM documents),
sh AS (SELECT DISTINCT doc_id, shingle FROM (
  SELECT doc_id, unnest(CASE WHEN len(toks) >= 3 THEN
    list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
    ELSE []::VARCHAR[] END) AS shingle FROM tarr)),
freq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
keep AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN freq USING (shingle)
         WHERE df <= {CONT_DF_CAP}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (SELECT a.doc_id AS ka, b.doc_id AS kb, COUNT(*) AS n_common
           FROM keep a JOIN keep b USING (shingle)
           WHERE a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id)
"""


@register(
    "dedup_containment",
    oracle=(
        f"WITH {_SQL_CONT} "
        "SELECT CASE WHEN sa.n_sh <= sb.n_sh THEN ka ELSE kb END AS inner_doc, "
        "CASE WHEN sa.n_sh <= sb.n_sh THEN kb ELSE ka END AS outer_doc, "
        "n_common, LEAST(sa.n_sh, sb.n_sh) AS n_inner, "
        + sql_round_stable("CAST(n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh)")
        + " AS containment "
        "FROM common JOIN sizes sa ON ka = sa.doc_id JOIN sizes sb ON kb = sb.doc_id "
        f"WHERE CAST(n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= {CONT_TAU}"
    ),
    doc="Doc-in-doc containment dedup: C = |A∩B| / min(|A|,|B|) over "
    "distinct word-trigram sets — the suffix/quotation case Jaccard "
    "misses (a short doc fully embedded in a long one scores |A|/|B| "
    "under Jaccard, far below any near-dup floor, but 1.0 under "
    "containment). Candidates from the same df-capped inverted shingle "
    "index as dedup_ngram_jaccard (hot-shingle skew guard); the smaller "
    "set is emitted as inner_doc — the side a containment-pruning "
    "pipeline would drop.",
    tags=("dedup", "ngram", "curation"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("toks"),
    )
    sh = ngram_shingles(docs, n=3)
    out = containment_pairs(sh, min_containment=CONT_TAU, df_cap=CONT_DF_CAP)
    return out.select(
        "inner_doc",
        "outer_doc",
        "n_common",
        "n_inner",
        round_stable("containment").alias("containment"),
    )


@register(
    "domain_lang_drift",
    oracle=(
        "WITH g AS (SELECT source, lang, "
        f"COUNT(*) FILTER ({h64_sql('doc_id', 'snap')} % 2 = 0) AS ca, "
        f"COUNT(*) FILTER ({h64_sql('doc_id', 'snap')} % 2 = 1) AS cb "
        "FROM documents GROUP BY source, lang), "
        "t AS (SELECT source, CAST(SUM(ca) AS BIGINT) AS na, "
        "CAST(SUM(cb) AS BIGINT) AS nb FROM g GROUP BY source), "
        "d AS (SELECT g.source AS source, MAX(t.na) AS n_a, MAX(t.nb) AS n_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_langs, "
        "CAST(SUM(abs(g.ca * t.nb - g.cb * t.na)) AS BIGINT) AS num "
        "FROM g JOIN t USING (source) GROUP BY g.source) "
        "SELECT source, n_a, n_b, n_langs, "
        + sql_round_stable("num / (2.0 * n_a * n_b)")
        + " AS tvd FROM d WHERE n_a > 0 AND n_b > 0"
    ),
    doc="Per-domain language-mix drift monitor (ROUND_QUEUE round-7 item b): "
    "the corpus split into two snapshot halves by a seeded doc hash, "
    "per-domain language share vectors compared by total-variation "
    "distance. TVD is computed in INTEGER arithmetic — "
    "sum|ca*nb - cb*na| as an exact BIGINT, one double division at the "
    "end — so no float accumulation order exists to diverge between "
    "engines or runs. Two corpus-linear groupBys + a domain-keyed join of "
    "domain-sized frames; the drift gauge a continuously-ingesting "
    "pipeline alerts on when a crawl snapshot shifts a domain's language "
    "mix.",
    tags=("curation", "agg_count_by_key", "skew"),
)
def domain_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    )
    b = (h64("doc_id", "snap") % 2).alias("b")
    g = (
        docs.select("source", "lang", b)
        .groupBy("source", "lang")
        .agg(
            F.count(F.when(F.col("b") == 0, 1)).alias("ca"),
            F.count(F.when(F.col("b") == 1, 1)).alias("cb"),
        )
    )
    t = g.groupBy("source").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    d = (
        g.join(t, "source")
        .groupBy("source")
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            F.count(F.lit(1)).alias("n_langs"),
            F.sum(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))).alias(
                "num"
            ),
        )
    )
    tvd = F.col("num") / (F.lit(2.0) * F.col("n_a") * F.col("n_b"))
    return d.filter((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        "source", "n_a", "n_b", "n_langs", round_stable(tvd).alias("tvd")
    )


CHUNK_TOKS = 10   # "line" analogue for the newline-free synthetic corpus
BOILER_DF = 2     # chunk text appearing in >= 2 distinct docs = boilerplate


def chunk_col(toks_col: str = "toks", n: int = CHUNK_TOKS) -> F.Column:
    """Fixed-n-token chunk array from a token-array column — one per-row
    transform, zero shuffle. The empty-token guard matters: Spark's
    sequence(0, -1) DESCENDS (yields [0, -1]) instead of producing an empty
    range like DuckDB's range(0, 0), so an unguarded empty doc would emit
    two phantom chunks."""
    return F.when(
        F.size(toks_col) == 0, F.array().cast("array<string>")
    ).otherwise(
        F.expr(
            f"transform(sequence(0, cast(ceil(size({toks_col}) / {n}.0) as int) - 1), "
            f"i -> array_join(slice({toks_col}, i * {n} + 1, {n}), ' '))"
        )
    )


@register(
    "chunk_dedup_boilerplate",
    oracle=(
        "WITH tarr AS (SELECT doc_id, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks "
        "FROM documents), "
        "ch AS (SELECT doc_id, unnest(list_transform("
        f"range(0, CAST(ceil(len(toks) / {CHUNK_TOKS}.0) AS BIGINT)), "
        f"i -> array_to_string(toks[i * {CHUNK_TOKS} + 1:(i + 1) * {CHUNK_TOKS}], ' ')"
        ")) AS chunk FROM tarr), "
        "d AS (SELECT DISTINCT doc_id, chunk FROM ch), "
        "f AS (SELECT chunk, COUNT(*) AS df FROM d GROUP BY chunk), "
        f"b AS (SELECT chunk FROM f WHERE df >= {BOILER_DF}) "
        "SELECT ch.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks, "
        "CAST(SUM(CASE WHEN b.chunk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_boiler, "
        "CAST(SUM(CASE WHEN b.chunk IS NULL THEN "
        "len(string_split(ch.chunk, ' ')) ELSE 0 END) AS BIGINT) AS kept_tokens "
        "FROM ch LEFT JOIN b ON ch.chunk = b.chunk GROUP BY ch.doc_id"
    ),
    doc="Repeated-passage (boilerplate) removal at sub-document granularity "
    "— the RefinedWeb/C4 line-dedup stage, with fixed 10-token chunks as "
    "the line analogue for this newline-free corpus: chunks whose exact "
    "text appears in >= 2 distinct docs are dropped; per doc the surviving "
    "chunk/token accounting is emitted. Chunking is a per-row array "
    "transform (zero shuffle); the df count and the boiler-mark join are "
    "both keyed on the chunk text — corpus-linear, and the post-join "
    "aggregate is per-doc so a viral chunk fans out only to its own "
    "occurrences.",
    tags=("dedup", "curation", "ngram"),
)
def chunk_dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    d = docs.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("toks"),
    )
    ch = d.select("doc_id", F.explode(chunk_col("toks")).alias("chunk"))
    dist = ch.distinct()
    boiler = (
        dist.groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= BOILER_DF)
        .select("chunk", F.lit(1).alias("is_b"))
    )
    marked = ch.join(boiler, "chunk", "left")
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("is_b") == 1, 1).otherwise(0)).alias("n_boiler"),
        F.sum(
            F.when(F.col("is_b").isNull(), F.size(F.split(F.col("chunk"), " "))).otherwise(0)
        )
        .cast("long")
        .alias("kept_tokens"),
    )


@register(
    "streaming_token_budget",
    oracle=SQL_TOKEN_BUDGET,
    doc="Stateful streaming twin of token_budget_sample "
    "(applyInPandasWithState, append mode): per domain the state is one "
    "long — cumulative tokens seen — and each micro-batch emits the docs "
    "that still fit the budget in the seeded hash order the batch window "
    "replays. availableNow delivers the whole table as one batch per key, "
    "so stream output == the batch oracle bit-for-bit; on a live stream "
    "the budget carries across arrival windows with O(domains) state.",
    tags=("streaming", "stateful", "curation", "sample_hashbucket"),
    bench=False,  # streaming job startup dominates; batch twin is benched
)
def streaming_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_stats import (
        documents_stream,
        run_available_now,
        stream_token_budget,
    )

    return run_available_now(
        stream_token_budget(documents_stream(spark, sf_dir), TOKEN_BUDGET),
        output_mode="append",
    )
