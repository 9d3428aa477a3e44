"""SparkSession factory + runtime-conf hygiene.

The reference hand-tuned a Dataproc cluster (Assignment 3 Description.htm:90:
``spark.executor.instances 3``, ``spark.executor.cores 8``, ...). The engine
replaces those static choices with Adaptive Query Execution and declarative
confs; at 100 TB the same code runs unchanged on a real cluster — only
``master`` and executor sizing differ.

Design notes for scale:
- AQE on: runtime partition coalescing, skew-join splitting, dynamic
  broadcast-join demotion/promotion.
- Arrow on: every pandas UDF exchange is columnar batches, not pickled rows
  (the reference pays per-row JVM<->CPython pickling on every RDD op).
- ``nanosAsLong``: the driver testdata stores TIMESTAMP(NANOS) parquet which
  Spark's vectorized reader refuses by default; the loader converts to
  micros-based timestamps (sources/tables.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe to set on an already-running session (runtime SQL confs).
#: ``ensure_runtime_confs`` applies these defensively because the verification
#: driver hands us *its* SparkSession, which we cannot configure at build time.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic NTZ<->epoch conversion: testdata timestamps are naive
    # wall-clock values whose oracle semantics are "as if UTC" (DuckDB
    # epoch_us); pinning the session tz makes the NTZ->TIMESTAMP cast in
    # sources/tables.py engine-neutral on any host.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Best-effort apply RUNTIME_CONFS to a live session (driver's or ours)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-settable in this deployment — keep going; readers will
            # surface a clear error if a required conf is truly missing.
            pass


def get_spark(
    app_name: str = "big-data-analytics-mini-projects-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` sizes local parallelism; ``shuffle_partitions``
    defaults to the same so local shuffles neither starve nor oversplit.
    On a real cluster, leave ``shuffle_partitions`` unset high and let AQE
    coalesce (we only pin it in local mode).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # ContextCleaner frees persisted/checkpointed blocks only after a JVM
        # GC makes their references weakly reachable; the default periodic-GC
        # interval (30min) means a multi-hundred-query suite accumulates every
        # released frame's blocks for its whole run (small heaps never GC
        # organically here). 2min bounds the accumulation; on a real cluster
        # the same setting keeps long-lived drivers from pinning dead blocks.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "2min"),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ensure_runtime_confs(spark)
    return spark
