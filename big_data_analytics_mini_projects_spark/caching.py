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

#: Family-scoped memo of lazily localCheckpoint-ed frames (plan-truncation
#: leaves, guide §3.3). Keyed by a caller-chosen name + sf_dir; cleared with
#: the persists at every family boundary, so its lifetime is identical to the
#: tracked persist cache it is built from.
_CHECKPOINTED: dict[tuple[str, str], DataFrame] = {}


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` + registration for deferred cleanup."""
    df.persist()
    _TRACKED.append(df)
    return df


def checkpoint_shared(name: str, sf_dir: str, df) -> DataFrame:
    """One lazy ``localCheckpoint`` per (name, sf_dir) per family visit.

    A localCheckpoint turns a deep analyzed tree into a leaf scan — the fix
    for curve/loop queries whose every Dataset op re-analyzes hundreds of
    operators (guide §3.3). But a FRESH checkpoint per build is a new RDD
    leaf, so downstream plans stop matching Spark's cache across bench
    repeats and sibling queries (measured: dedup_compaction_curve's exec
    went 0.75 s -> 2.4 s when each repeat checkpointed anew). Memoizing the
    checkpointed frame restores plan identity: every consumer in the family
    sees the SAME leaf, so derived persists keep hitting. The memo holds no
    results beyond what the checkpoint blocks (and the tracked persists it
    was computed from) already hold, and is dropped at the same family
    boundary.

    ``df`` may be a DataFrame or a zero-arg callable returning one: the
    callable form defers CONSTRUCTION (python expression building + eager
    JVM analysis) on memo hits — for frames built from hundreds of parsed
    expressions that is most of the per-build cost.

    Memo-hit safety (round-11 ADVICE): a hit whose cached leaf was built by
    a DIFFERENT SparkSession is treated as a miss (a restarted session's
    checkpoint blocks are gone), and when the caller passes an already-built
    DataFrame its schema must match the cached leaf's — the guard against a
    future caller silently reusing a key for a different frame. The thunk
    form can't be schema-checked without defeating its purpose; key
    uniqueness there is by the same naming convention."""
    key = (name, sf_dir)
    entry = _CHECKPOINTED.get(key)
    if entry is not None:
        session, got = entry
        if not callable(df) and df.schema != got.schema:
            raise ValueError(
                f"checkpoint_shared({name!r}, {sf_dir!r}): memo hit with a "
                f"different frame schema — two callers are reusing the key "
                f"for different derivations. Cached: {got.schema.simpleString()}, "
                f"incoming: {df.schema.simpleString()}"
            )
        from pyspark.sql import SparkSession

        current = (
            df.sparkSession if not callable(df) else SparkSession.getActiveSession()
        )
        if current is None or session is current:
            return got
        # session restarted since the leaf was cached -> rebuild below
    if callable(df):
        df = df()
    got = df.localCheckpoint(eager=False)
    _CHECKPOINTED[key] = (df.sparkSession, got)
    return got


def release_persisted() -> None:
    """Unpersist (non-blocking) every tracked frame and drop the checkpoint
    memo. Called by the registry at family boundaries and safe to call at
    any time."""
    while _TRACKED:
        _TRACKED.pop().unpersist()
    _CHECKPOINTED.clear()
