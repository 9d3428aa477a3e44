"""Aggregation point for the query catalog.

Importing this module registers every declared query (one per implemented
operator from SURVEY.md §2) into ``QUERIES``. ``__spark_entry__.py`` re-exports
exactly this catalog to the verification driver.
"""

from .registry import QUERIES, QuerySpec, register  # noqa: F401

# Each import populates the registry via @register side effects.
from . import core  # noqa: F401  (relational / TPC-H / JSON / window)
from . import textq  # noqa: F401  (tokenizers / word count / set ops / mean-chars)
from . import samplingq  # noqa: F401  (samplers / welford / hourly windows)
from . import linalgq  # noqa: F401  (COO matmul)
from . import statsq  # noqa: F401  (per-word OLS hypothesis testing)
from . import recommendq  # noqa: F401  (item-item CF similarity + prediction)
from . import similarityq  # noqa: F401  (minhash / LSH / dedup suite)
from . import vectorq  # noqa: F401  (embedding ANN / cosine dedup)
from . import textanalysisq  # noqa: F401  (lang-id / quality / tokens / fingerprints)
from . import multimodalq  # noqa: F401  (multimodal decode plumbing + streaming)
from . import sourcesq  # noqa: F401  (CSV / JSON-lines ingestion round trips, sorted sink)
from . import sketchq  # noqa: F401  (HLL distinct / Count-Min heavy hitters)
from . import relationalx  # noqa: F401  (rollup/cube, Q5 multi-join, range join, frames, quantiles)
