"""Query registry: every operator from SURVEY.md §2 lands here as a named,
driver-runnable query bound to the testdata tables, usually paired with a
DuckDB oracle (the differential-correctness gate in __spark_entry__.py).

Determinism contract for every registered query (SURVEY.md §7.4):
- total ordering before every LIMIT (explicit tiebreakers);
- float aggregates via exact decimal sufficient statistics where the value
  feeds a hash-compare, else rounded;
- only the cross-engine md5 hash (functions/hashing.py) for bucketing;
- no wall clock, no unseeded randomness.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..caching import release_persisted

Builder = Callable[[SparkSession, str], DataFrame]

#: Module of the most recently built query — persisted intermediates are
#: shared within a module family (see caching.py) and released when query
#: execution crosses into the next module.
_last_built_module: str | None = None


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL over driver views; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = True  # include in bench.py suite
    #: Optional scale-form oracle: same result as ``oracle`` but written to
    #: run at 100x data (e.g. the minhash signature built as one wide
    #: min-aggregate pass instead of a seeds-cross-join scatter, which needs
    #: more spill than a single box has at sf10). The driver gate always
    #: uses ``oracle``; tools/sf1_differential.py prefers this at scale;
    #: tests/test_scale_tools.py pins oracle == scale_oracle at driver SFs.
    scale_oracle: str | None = None


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = True,
    scale_oracle: str | None = None,
):
    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Family-boundary cache cleanup: queries in one module share
            # persisted intermediates; entering a different module releases
            # the previous family's blocks (caching.py). Builders invoked
            # directly as functions (query composition) bypass this wrapper
            # on purpose — only top-level catalog execution rotates caches.
            global _last_built_module
            if _last_built_module is not None and _last_built_module != fn.__module__:
                release_persisted()
            _last_built_module = fn.__module__
            return fn(spark, sf_dir)

        QUERIES[name] = QuerySpec(
            name, build, oracle, doc or (fn.__doc__ or ""), tags, bench, scale_oracle
        )
        return fn

    return deco
