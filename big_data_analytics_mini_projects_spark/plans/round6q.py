"""Round-6 queries: the retuned (occupancy-rule, self-scaling) embedding
dedup plus the new LLM-training-data pipeline stages of this round —
URL/domain-level curation (the C4/RefinedWeb stage the PII/quality stages
presuppose) and cross-snapshot fuzzy dedup.

`dedup_embedding_bucketed` here REPLACES the frozen 4x4-bit declaration that
lived in plans/vectorq.py through round 5: the round-5 verdict's single 100x
non-runner (fixed-width LSH occupancy densification — 4-bit bands were 6.5 s
at 2k vectors, 409 s at 20k, killed at ~25 min at 200k). The band width now
derives from the corpus size by the operator's own measured rule
``band_bits ≈ log2(n / occupancy)`` (operators/vector.py), computed as an
integer-exact comparison ladder in BOTH engines so the declared result stays
oracle-checkable at every scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import round_stable, sql_round_stable
from ..operators.vector import (
    AUTO_MAX_BITS,
    AUTO_OCCUPANCY,
    N_BANDS,
    bucketed_near_pairs_auto,
    hyperplane_signs,
)
from .registry import register
from .shared import SQL_VECS, embedding_vectors

NEAR_MIN_COS = 0.35  # same verify floor as the round-2..5 declaration


def _sql_w_ladder(occ: int = AUTO_OCCUPANCY, max_bits: int = AUTO_MAX_BITS) -> str:
    """DuckDB mirror of operators/vector.auto_band_bits: the integer
    comparison ladder w = 4 + #{k in [4, max_bits) : n > occ * 2^k}."""
    terms = " + ".join(
        f"(CASE WHEN n > {occ << k} THEN 1 ELSE 0 END)" for k in range(4, max_bits)
    )
    return f"st AS (SELECT 4 + {terms} AS w FROM (SELECT COUNT(*) AS n FROM e))"


def _sql_band_bucket_full(b: int, max_bits: int = AUTO_MAX_BITS) -> str:
    """Band b's FULL max_bits-bit SRP bucket (plane stride max_bits, matching
    banded_bucket_exprs(N_BANDS, AUTO_MAX_BITS) on the Spark side)."""
    signs = hyperplane_signs(N_BANDS * max_bits)
    terms = []
    for i in range(max_bits):
        lits = ", ".join(f"{x:.1f}" for x in signs[b * max_bits + i])
        terms.append(
            f"(CASE WHEN list_dot_product(v, [{lits}]::DOUBLE[]) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


def _sql_banded_auto() -> str:
    structs = ", ".join(
        f"struct_pack(band := {b}, bucket := {_sql_band_bucket_full(b)})"
        for b in range(N_BANDS)
    )
    return (
        "banded AS (SELECT vec_id, v, bb.band AS band, "
        "bb.bucket & ((1::BIGINT << w) - 1) AS bucket "
        f"FROM (SELECT vec_id, v, unnest([{structs}]) AS bb FROM e) CROSS JOIN st)"
    )


@register(
    "dedup_embedding_bucketed",
    oracle=(
        f"WITH {SQL_VECS}, {_sql_w_ladder()}, {_sql_banded_auto()}, "
        "cand AS (SELECT DISTINCT ka, kb, cos FROM ("
        "SELECT a.vec_id AS ka, b.vec_id AS kb, "
        "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * "
        "sqrt(list_dot_product(b.v, b.v))) AS cos "
        "FROM banded a JOIN banded b "
        "ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id) "
        f"WHERE cos >= {NEAR_MIN_COS}) "
        f"SELECT ka, kb, {sql_round_stable('cos', 6)} AS cos FROM cand"
    ),
    doc="Embedding-cosine dedup at scale, round-6 retune: banded SRP "
    "blocking with the band width derived from the corpus size by the "
    "occupancy rule (4 bands x w bits, w = clamp(ceil(log2(n/32)), 4, 14) "
    "as an integer comparison ladder over a broadcast 1-row COUNT) -> ONE "
    "equi-join on (band, bucket) -> exact-cosine verify -> cross-band "
    "distinct. Replaces the round-2..5 frozen 4x4-bit declaration, the "
    "verdict's one 100x non-runner: at fixed width per-bucket occupancy "
    "grows linearly with the corpus and the verify stage quadratically "
    "(409 s at 20k vectors, killed at 200k); the adaptive width holds "
    "occupancy ~32 so verify work stays ~linear (w: 500 vecs -> 4 bits, "
    "2k -> 6, 20k -> 10, 200k -> 13). Recall at near-dup geometry stays "
    "high at every width (>= 0.95 at cos 0.99 through w=14, capture "
    "1-(1-p^w)^4); the loose 0.35 floor is a verify threshold, not a "
    "recall target. Width rule + measurements: operators/vector.py "
    "bucketed_near_pairs{,_auto}.",
    tags=("dedup", "ann", "lsh_band", "embedding"),
)
def dedup_embedding_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = embedding_vectors(spark, sf_dir)
    out = bucketed_near_pairs_auto(vecs, NEAR_MIN_COS)
    return out.select("ka", "kb", round_stable("cos", 6).alias("cos"))
