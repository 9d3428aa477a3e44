"""Aggregation point for the query catalog.

Importing this module registers every declared query (one per implemented
operator from SURVEY.md §2) into ``QUERIES``. ``__spark_entry__.py`` re-exports
exactly this catalog to the verification driver.

REGISTRATION ORDER MATTERS: the correctness driver verifies exactly the FIRST
50 catalog entries per round (registration order == import order below, then
decorator order within a module; 50 confirmed by CORRECTNESS_r03..r10 all
holding exactly the first-50 set of their round's ordering).

ROUND-11 WINDOW (round-10 verdict item 1: driver-verify the 7 round-10-
authored tail queries, then the round-11 fresh batch, then oldest greens):

  1. round14q (2) + pipelineq (4) — FORCED RIDERS, both r10-green: round16q
     imports round14q (state-family CTEs/builders) and pipelineq (_SQL_KM,
     K_CENTROIDS) at module level, so both register before it no matter
     what. Positions 1-6; harmless re-verification of r10 greens.
  2. round16q (3) + round17q (3) + round18q (1) — the round-10-authored
     forward batches, never driver-verified (positions 7-13). THE round-11
     priority (round-10 verdict item 1). round17q imports round16q
     (adjacent, free); round18q is rider-free by construction.
  3. round19q (6) — the round-11 fresh batch (positions 14-19): SemDeDup
     auto-K occupancy rule (verdict item 2), audio perceptual dedup
     (item 3), streaming tombstone fold (item 4), cross-modal pair
     curation (item 5), aHash near-dup block join + SemDeDup quality
     keeper (ROUND_QUEUE round-11 queue themes). Imports only round16q/
     round17q + operators — no new riders (both already in-window).
  4. qaq (5) — the three r8 position-51-53 spills from round 10
     (label_drift_chi2, multimodal_png_decode, streaming_session_windows)
     plus two r10 greens that ride with the module (positions 20-24).
  5. sourcesq (5) + samplingq (7) + round6q (11) — the r6 cohort, 5 rounds
     stale (positions 25-47).
  6. recommendq head (3) — positions 48-50: cf_item_similarity,
     cf_predict_ratings, cf_predict_ratings_k50 (r6). The module's 4th
     (cf_item_similarity_salted, r6) is the planned position-51 spill —
     local differential mirror recorded in ROUND_QUEUE.md (the round-8
     position-51 spill precedent).

  Tier total: 6+7+6+5+23+3 = 50 — the window exactly.

  relationalx (12, r6) queues at 52-63 for the round-12 window; textq (5)
  + warehouseq (3) (r7) behind it.

  DEPENDENCY NOTE: module-level plan imports pin similarityq < round11q <
  round12q, vectorq < baselineq, round13q < round15q (+ round14q < round15q
  via the decoration-time oracle builder), pipelineq/round14q < round16q <
  round17q < round19q. All satisfied below. The position probe in
  tests/test_plan_hygiene.py pins the set.

Round queues and history live in ROUND_QUEUE.md (round-5 verdict item 8) —
this docstring stays the registration-order contract only.

STANDING RULES (ROUND_QUEUE.md has the full list): any round that touches
session.py or sources/ must re-window every timestamp-consuming query; any
query whose last driver verdict is >=3 rounds old outranks re-verification
of fresher greens (round-9 verdict item 6).

When adding a module/query, slot it BEFORE the already-green block so it gets
driver coverage in its first round — unless the window is consumed by debt
clearing, in which case register at the tail as a forward batch and ledger it
locally (the round15q/round16q precedent).
"""

from .registry import QUERIES, QuerySpec, register  # noqa: F401

# Each import populates the registry via @register side effects.
# -- tier 1: forced riders (round16q's module-level deps) --
from . import round14q  # noqa: F401
from . import pipelineq  # noqa: F401

# -- tier 2: the round-10 forward batches, never driver-verified --
from . import round16q  # noqa: F401
from . import round17q  # noqa: F401
from . import round18q  # noqa: F401

# -- tier 3: the round-11 fresh batch --
from . import round19q  # noqa: F401

# -- tier 4: the r8 qaq spills (+2 r10 module riders) --
from . import qaq  # noqa: F401

# -- tiers 5-6: the r6 cohort, oldest-first; recommendq's 4th entry is the
# planned position-51 spill --
from . import sourcesq  # noqa: F401
from . import samplingq  # noqa: F401
from . import round6q  # noqa: F401
from . import recommendq  # noqa: F401

# ---- driver window boundary (50) ----

# -- r6 overflow queued for round 12, then r7 --
from . import relationalx  # noqa: F401
from . import textq  # noqa: F401
from . import warehouseq  # noqa: F401

# -- outside the window: most recent driver greens last --
from . import similarityq  # noqa: F401
from . import round11q  # noqa: F401
from . import round12q  # noqa: F401
from . import vectorq  # noqa: F401
from . import baselineq  # noqa: F401
from . import round7q  # noqa: F401
from . import round8q  # noqa: F401
from . import privacyq  # noqa: F401
from . import graphq  # noqa: F401
from . import round9q  # noqa: F401
from . import round10q  # noqa: F401
from . import multimodalq  # noqa: F401
from . import mlq  # noqa: F401
from . import linalgq  # noqa: F401
from . import streamequivq  # noqa: F401
from . import decisionq  # noqa: F401
from . import core  # noqa: F401
from . import curationq  # noqa: F401
from . import qualityq  # noqa: F401
from . import fuzzydedupq  # noqa: F401
from . import statsq  # noqa: F401
from . import round13q  # noqa: F401
from . import round15q  # noqa: F401
from . import tpchx  # noqa: F401
from . import textanalysisq  # noqa: F401
from . import corpusq  # noqa: F401
from . import sketchq  # noqa: F401
from . import tpchfull  # noqa: F401

# -- round-11 fresh batch part 2 (forward — ROUND-12 window) --
from . import round20q  # noqa: F401
