"""Aggregation point for the query catalog.

Importing this module registers every declared query (one per implemented
operator from SURVEY.md §2) into ``QUERIES``. ``__spark_entry__.py`` re-exports
exactly this catalog to the verification driver.

REGISTRATION ORDER MATTERS: the correctness driver verifies roughly the FIRST
50 catalog entries per round (registration order == import order below, then
decorator order within a module). Round 2 verified positions 1-50 (all green,
CORRECTNESS_r02.json); the round-3 goal is that the union of rounds 1-3 has a
full-hash green row for every declared query on its CURRENT implementation.
Ordering for round 3:

  1. queries with no driver verdict yet: qaq (round-2 positions 61-65) and
     every round-3 module (curationq, warehouseq, decisionq) / addition;
  2. modules REWRITTEN in round 2 whose green rows predate the rewrite
     (statsq 33e4f5f; recommendq d208ecf; samplingq 137d20d) plus round-3
     changes inside them (ols_words_pvalues oracle, cf_predict_ratings_k50,
     dedup_embedding_bucketed, CC two-phase, dedup_apply_canonical);
  3. window fill: modules whose verdicts are round-1 but unchanged since
     (core, textq, linalgq) — harmless to re-verify, safe to truncate;
  4. modules fully green in round 2 on current code, registered last.

Round-3 tiers 1-2 land at positions 1-50 EXACTLY (decisionq's Q13 is #50) —
the window is full: a round-4 addition must either displace a tier-3 entry
or wait a round for its verdict. Shared helpers live in plans/shared.py
(registration-free) precisely so a cross-module import can never reorder
this file's contract.

When adding a module/query, slot it BEFORE the already-green block so it gets
driver coverage in its first round.
"""

from .registry import QUERIES, QuerySpec, register  # noqa: F401

# Each import populates the registry via @register side effects.
# -- tier 1: never driver-checked (round-2 positions 61-65, plus the whole
#    round-3 curation/graph module) --
from . import qaq  # noqa: F401  (PMI, chi-square drift, PNG codec, session windows, range overlap)
from . import curationq  # noqa: F401  (round-3: dup-n-gram coverage, repetition, contamination, prefix join, triangles)
from . import qualityq  # noqa: F401  (round-3 precision fix: text_quality + corpus_prep_pipeline stable rounding)
from . import linalgq  # noqa: F401  (round-3 precision fix: exact-decimal matmul products at sf0.1 magnitudes)

# -- tier 2: rewritten-in-round-2 modules (driver rows predate the rewrite)
#    plus all round-3 additions --
from . import statsq  # noqa: F401  (OLS closed forms; round-3: closed-form p-value oracle)
from . import recommendq  # noqa: F401  (CF similarity + prediction; round-3: k=50 cap)
from . import samplingq  # noqa: F401  (samplers / welford / hourly windows; r2 top-k rewrite)
from . import vectorq  # noqa: F401  (embedding ANN; round-3: banded SRP bucketed dedup, multi-probe LSH, pairless diversity)
from . import similarityq  # noqa: F401  (minhash / LSH / dedup; round-3: two-phase CC)
from . import warehouseq  # noqa: F401  (round-3: ORC round trip, incremental snapshot merge, column profiler)
from . import decisionq  # noqa: F401  (round-3: TPC-H Q4 EXISTS semi, Q13 outer-join distribution)

# -- tier 3: window fill — verdicts are round-1 but code unchanged since --
from . import core  # noqa: F401  (relational / TPC-H / JSON / window)
from . import textq  # noqa: F401  (tokenizers / word count / set ops / mean-chars)
from . import baselineq  # noqa: F401  (r1-green unchanged vector baselines, demoted to free window slots)

# -- tier 4: fully green in round 2 on current code --
from . import multimodalq  # noqa: F401  (multimodal decode plumbing + streaming)
from . import sourcesq  # noqa: F401  (CSV / JSON-lines ingestion round trips, sorted sink)
from . import sketchq  # noqa: F401  (HLL distinct / Count-Min heavy hitters)
from . import relationalx  # noqa: F401  (rollup/cube, Q5 multi-join, range join, frames, quantiles)
from . import textanalysisq  # noqa: F401  (lang-id / quality / tokens / fingerprints)
from . import mlq  # noqa: F401  (momentum-GD linear regression)
from . import pipelineq  # noqa: F401  (incremental dedup, k-means step, funnel, BM25)
from . import graphq  # noqa: F401  (PageRank over the trade graph)
from . import corpusq  # noqa: F401  (bigram LM, SCD2, weighted reservoir, int8 quantize)
