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


def _parse_size_bytes(s: str) -> int:
    """Parse a Spark byte-size conf string: plain integers ("134217728"),
    byte-suffixed ("134217728b") and k/m/g/t/p forms with optional trailing
    b ("128m", "128mb", "1g") — the grammar of Spark's JavaUtils
    byteStringAs, which `spark.sql.files.maxPartitionBytes` round-trips
    through (a user-set "128m" previously killed the probe; round-11
    ADVICE)."""
    s = s.strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    if s and s[-1] in "kmgtp":
        mult = 1024 ** ("kmgtp".index(s[-1]) + 1)
        s = s[:-1]
    return int(s) * mult


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
    about (§2.4). So the repartition is conditional on the scan's estimated
    parallelism: when the file listing says the source already yields >= the
    session's default parallelism in NON-EMPTY splits (file count, capped by
    Spark's open-cost packing arithmetic — driver-side only, no job), the
    frame passes through untouched. Results are unaffected either way: every
    consumer is an exchange-insensitive expansion/aggregation."""
    sc = df.sparkSession.sparkContext
    n = partitions or sc.defaultParallelism
    try:
        # Split-count estimate from the scan's file listing, mirroring
        # Spark's FilePartition packing: each file is charged
        # openCostInBytes, splits are at most maxSplitBytes =
        # min(maxPartitionBytes, max(openCost, totalBytes/defaultParallelism)).
        # `df.rdd.getNumPartitions()` would be exact but compiles the whole
        # physical plan (~0.1-0.2 s of driver time PER CALL — measured; at
        # ~60 spread sites x 3 bench repeats that is suite-level damage);
        # inputFiles() is a pure listing (~0.02 s). The estimate is capped
        # at len(files) (round-11 ADVICE): Spark can split one large file
        # into many byte ranges, but a single-row-group parquet file yields
        # one NON-EMPTY partition however it is ranged, so counting those
        # extra ranges would over-state effective parallelism and silently
        # skip the rebalance this function exists to add. The cap errs
        # toward keeping a repartition that exact probing might skip; the
        # probe is a hint only — results are identical either way.
        files = df.inputFiles()
        est = len(files)
        if est and est >= n:
            import os

            conf = df.sparkSession.conf
            max_pb = _parse_size_bytes(
                conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
            )
            open_cost = _parse_size_bytes(
                conf.get("spark.sql.files.openCostInBytes", "4194304b")
            )
            local = [f[len("file:"):] for f in files if f.startswith("file:")]
            if len(local) == len(files):
                total = sum(os.path.getsize(f) for f in local) + len(files) * open_cost
                max_split = min(max_pb, max(open_cost, total // max(1, sc.defaultParallelism)))
                est = min(est, -(-total // max_split))
        if est >= n:
            return df
    except Exception:
        # Fall through to the repartition if the listing probe fails
        # (exotic plans); correctness never depends on the probe.
        pass
    return df.repartition(n)
