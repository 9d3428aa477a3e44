"""Aggregation point for the query catalog.

Importing this module registers every declared query (one per implemented
operator from SURVEY.md §2) into ``QUERIES``. ``__spark_entry__.py`` re-exports
exactly this catalog to the verification driver.

REGISTRATION ORDER MATTERS: the correctness driver verifies roughly the FIRST
50 catalog entries per round (registration order == import order below, then
decorator order within a module). Round 1 verified entries 1-50 and left
entries 51-76 (multimodal/streaming, sources, sketches, relationalx) without a
driver verdict. Modules are therefore ordered so queries still needing a green
CORRECTNESS row register first:

  1. never-driver-checked modules (multimodalq, sourcesq, sketchq, relationalx);
  2. modules containing round-1 hash-fail oracles being re-verified
     (textanalysisq: lang_id_ngram/token_counts_by_source/corpus_prep_pipeline;
     core: project_json_events) and any newly added queries (mlq);
  3. modules already fully green in round 1 (fill the remaining window slots —
     harmless to re-verify, safe to fall outside the window).

When adding a module/query, slot it BEFORE the already-green block so it gets
driver coverage in its first round.
"""

from .registry import QUERIES, QuerySpec, register  # noqa: F401

# Each import populates the registry via @register side effects.
# -- tier 1: no driver verdict yet (round-1 catalog positions 51-76) --
from . import multimodalq  # noqa: F401  (multimodal decode plumbing + streaming)
from . import sourcesq  # noqa: F401  (CSV / JSON-lines ingestion round trips, sorted sink)
from . import sketchq  # noqa: F401  (HLL distinct / Count-Min heavy hitters)
from . import relationalx  # noqa: F401  (rollup/cube, Q5 multi-join, range join, frames, quantiles)

# -- tier 2: round-1 hash-fail oracles (HUGEINT casts fixed) + new queries,
#    then modules whose implementation changed this round (OLS closed forms,
#    CF broadcast guards, sampler top-k rewrite) so the driver re-verifies
#    as many changed queries as the window allows --
from . import textanalysisq  # noqa: F401  (lang-id / quality / tokens / fingerprints)
from . import mlq  # noqa: F401  (momentum-GD linear regression, MLlib equivalence)
from . import pipelineq  # noqa: F401  (incremental dedup, k-means step, funnel, BM25)
from . import graphq  # noqa: F401  (PageRank over the trade graph; new round 2)
from . import corpusq  # noqa: F401  (bigram LM, SCD2, weighted reservoir, int8 quantize; new round 2)
from . import core  # noqa: F401  (relational / TPC-H / JSON / window; red fix first)
from . import qaq  # noqa: F401  (PMI collocations, chi-square drift; after core so the red fix keeps its window slot)
from . import statsq  # noqa: F401  (per-word OLS hypothesis testing)
from . import recommendq  # noqa: F401  (item-item CF similarity + prediction)
from . import samplingq  # noqa: F401  (samplers / welford / hourly windows)

# -- tier 3: fully green in round 1, unchanged --
from . import textq  # noqa: F401  (tokenizers / word count / set ops / mean-chars)
from . import linalgq  # noqa: F401  (COO matmul)
from . import similarityq  # noqa: F401  (minhash / LSH / dedup suite)
from . import vectorq  # noqa: F401  (embedding ANN / cosine dedup)
