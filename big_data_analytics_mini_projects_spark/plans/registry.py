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

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL over driver views; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = True  # include in bench.py suite


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = True,
):
    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench)
        return fn

    return deco
