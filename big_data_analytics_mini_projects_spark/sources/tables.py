"""Loaders for the driver's deterministic parquet testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.

Scale notes: at 100 TB these would be partitioned parquet/iceberg directories;
``spark.read.parquet`` on a directory is the identical call. The only local
quirk handled here is the nanosecond timestamp encoding of ``events.ts``
(Spark reads it as long nanos under ``spark.sql.legacy.parquet.nanosAsLong``;
we derive ``ts_us`` (epoch micros, long) and a proper timestamp column so both
epoch-based arithmetic and event-time windowing are available downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import ensure_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing timestamp encodings."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dtypes = dict(df.dtypes)
        if dtypes.get("ts") == "bigint":
            # TIMESTAMP(NANOS) read as long nanos: keep epoch-micros long for
            # engine-neutral arithmetic + a real timestamp for streaming windows.
            df = df.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
                "ts", F.timestamp_micros(F.col("ts_us"))
            )
        elif dtypes.get("ts") == "timestamp_ntz":
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as NTZ: the
            # naive value means "as if UTC" (matching the oracle's
            # epoch_us), so cast under the pinned UTC session tz for epoch
            # micros, then rebuild a TIMESTAMP column for event-time
            # windowing (unix_micros/watermarks reject NTZ).
            df = df.withColumn(
                "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
            ).withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        else:  # already a tz-aware timestamp
            df = df.withColumn("ts_us", F.unix_micros(F.col("ts")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition a scan before per-row-EXPENSIVE expansion (tokenize,
    shingle, per-seed hashing, trigram explode) — ONLY when the scan is
    actually starved for parallelism.

    A single small parquet file scans as ONE input split, which serializes
    the entire downstream explode/hash pipeline onto one core until the
    first shuffle — measured 6.6 s single-threaded vs <1 s spread for the
    trigram pipeline at sf0.1. One cheap exchange of the compact base rows
    buys full parallelism for the expansion. Keep it AFTER any scan-level
    filter so pushdown still reaches parquet.

    At 100 TB the input arrives in thousands of splits and an unconditional
    ``repartition(n)`` would be a FULL round-robin shuffle of the corpus
    (plus the sort-before-repartition each map task pays, SPARK-23207) for
    nothing — exactly the accidental exchange the optimization guide warns
    about (§2.4). So the repartition is now conditional on the plan's actual
    scan parallelism: when the source already yields >= the session's
    default parallelism in partitions, the frame passes through untouched
    (checked via the compiled plan's partition count — driver-side only, no
    job). Results are unaffected either way: every consumer is an
    exchange-insensitive expansion/aggregation."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        # Split-count estimate from the scan's file listing: #files plus
        # how many maxPartitionBytes-sized splits the (local) bytes yield.
        # `df.rdd.getNumPartitions()` would be exact but compiles the whole
        # physical plan (~0.1-0.2 s of driver time PER CALL — measured; at
        # ~60 spread sites x 3 bench repeats that is suite-level damage);
        # inputFiles() is a pure listing (~0.02 s) and errs conservatively
        # (it never over-estimates splits, so at worst we keep a repartition
        # that exact probing would have skipped). The probe is a hint only —
        # results are identical with or without the repartition.
        files = df.inputFiles()
        est = len(files)
        if est and est < n:
            import os

            max_pb = int(
                df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
                .rstrip("b")
            )
            local = [f[len("file:"):] for f in files if f.startswith("file:")]
            if len(local) == len(files):
                total = sum(os.path.getsize(f) for f in local)
                est = max(est, -(-total // max_pb))
        if est >= n:
            return df
    except Exception:
        # Fall through to the repartition if the listing probe fails
        # (exotic plans); correctness never depends on the probe.
        pass
    return df.repartition(n)
