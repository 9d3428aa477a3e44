"""Tracked persist lifecycle (round-4 verdict item 4 / ADVICE item 3).

Several query families persist a shared intermediate (the CF filtered
ratings, LSH band tables, PageRank transition matrix, ...). Spark's
CacheManager matches cached plans structurally, so consecutive queries in
the same family hit one materialization — the behavior the bench suite
measures and the reason plans deliberately re-`persist()` the same
derivation. But nothing ever unpersisted: over a 117-query suite the
executor storage pool accumulated every family's blocks.

Discipline implemented here: every persist in the package goes through
:func:`persist_tracked`; the query registry (plans/registry.py) releases all
tracked frames whenever query execution crosses a MODULE boundary (catalog
order groups each family into one module, and the driver/bench run in
catalog order) — so intra-family cache sharing is preserved while no more
than one family's blocks are ever live. Unpersisting is never a correctness
hazard: a released frame that is still referenced just recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` + registration for deferred cleanup."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_persisted() -> None:
    """Unpersist (non-blocking) every tracked frame. Called by the registry
    at family boundaries and safe to call at any time."""
    while _TRACKED:
        _TRACKED.pop().unpersist()
