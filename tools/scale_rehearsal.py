"""Scale rehearsal (verdict r3 item 7): run the dedup+curation pipeline at
sf0.1 AND the 10x .scratch/sf1 dataset (tools/make_sf1.py), recording
per-query wall time and PER-STAGE shuffle/spill/input metrics from the Spark
REST API, so the 100 TB story rests on a measured scaling curve instead of
plan-shape argument alone. Results land in BASELINE.md by hand.

Usage: python tools/scale_rehearsal.py [--scaled-dir=PATH] [query ...]

--scaled-dir picks the 10x dataset variant (default .scratch/sf1; pass
.scratch/sf1f for queries whose derivation joins lineitem with orders —
CF ratings, PageRank — so the joined frame actually carries 10x rows; see
tools/make_sf1.py).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import SparkSession

from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.session import RUNTIME_CONFS

DEFAULT_QUERIES = [
    "corpus_prep_pipeline",
    "dedup_apply_canonical",
    "pack_sequences_2048",
    "dedup_minhash_lsh",
    "tpch_q1_pricing_summary",
]

UI = "http://localhost:4040/api/v1"


def _get(path: str):
    with urllib.request.urlopen(f"{UI}{path}", timeout=10) as r:
        return json.loads(r.read())


def _stage_rows(app_id: str) -> dict[int, dict]:
    out = {}
    for s in _get(f"/applications/{app_id}/stages?status=complete"):
        out[(s["stageId"], s["attemptId"])] = s
    return out


def main() -> None:
    argv = sys.argv[1:]
    scaled_dir = os.path.join(_REPO_DIR, ".scratch", "sf1")
    names = []
    for a in argv:
        if a.startswith("--scaled-dir="):
            scaled_dir = os.path.abspath(a.split("=", 1)[1])
        else:
            names.append(a)
    names = names or DEFAULT_QUERIES
    scaled_label = os.path.basename(scaled_dir.rstrip("/"))
    if scaled_label == "sf0.1":
        # the results dict keys on (query, label); a scaled dir whose
        # basename collides with the baseline would silently overwrite one
        # side of the ratio summary (round-4 ADVICE)
        sys.exit("--scaled-dir basename must not be 'sf0.1' (baseline label)")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # The knob a real cluster turns as data grows: shuffle partition count.
    # Default couples to cpus (the sf1/sf10 ledger runs); at sf100 (1000x)
    # 32 partitions put ~600 MB of shuffle read in one task, so the ledger
    # runs pass 128 here — the spark.sql.files.maxPartitionBytes-style
    # sizing rule BASELINE.md documents, demonstrated rather than argued.
    shuffle_parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus)))
    builder = (
        SparkSession.builder.appName("bdamp-scale-rehearsal")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4040")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    results = []
    for sf_label, sf_dir in [
        ("sf0.1", "/root/testdata/sf0.1"),
        (scaled_label, scaled_dir),
    ]:
        for name in names:
            spec = QUERIES[name]
            # one untimed warm run (codegen/JIT, parquet footers), then timed
            spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            before = set(_stage_rows(app_id))
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            time.sleep(0.5)
            stages = _stage_rows(app_id)
            new = [s for k, s in stages.items() if k not in before]
            rec = {
                "query": name,
                "sf": sf_label,
                "wall_s": round(wall, 2),
                "stages": len(new),
                "tasks": sum(s["numTasks"] for s in new),
                "input_mb": round(sum(s["inputBytes"] for s in new) / 1e6, 1),
                "shuffle_write_mb": round(
                    sum(s["shuffleWriteBytes"] for s in new) / 1e6, 2
                ),
                "shuffle_read_mb": round(
                    sum(s["shuffleReadBytes"] for s in new) / 1e6, 2
                ),
                "spill_disk_mb": round(
                    sum(s["diskBytesSpilled"] for s in new) / 1e6, 2
                ),
                "top_stages": sorted(
                    (
                        {
                            "name": s["name"].split("\n")[0][:60],
                            "tasks": s["numTasks"],
                            "shuffle_write_mb": round(s["shuffleWriteBytes"] / 1e6, 2),
                            "shuffle_read_mb": round(s["shuffleReadBytes"] / 1e6, 2),
                            "run_ms": s["executorRunTime"],
                        }
                        for s in new
                    ),
                    key=lambda d: -d["run_ms"],
                )[:4],
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
            spark.catalog.clearCache()
            # Single-box disk bound: a warm + timed pass over the heavy
            # queries accumulates O(100 GB) of shuffle files at 1000x if
            # left to lazy cleanup. Dropping the DataFrame references above
            # makes the shuffle dependencies collectable; an explicit JVM
            # GC lets ContextCleaner delete their files before the next
            # query runs. (Cluster deployments don't need this — shuffle
            # files live on executor-local disks sized for the job.)
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.0)

    # scaling summary: sf1/sf0.1 ratios per query
    by = {(r["query"], r["sf"]): r for r in results}
    print(f"\n== scaling ratios ({scaled_label} / sf0.1) ==", flush=True)
    for name in names:
        a, b = by.get((name, "sf0.1")), by.get((name, scaled_label))
        if a and b:
            print(
                f"{name}: wall {b['wall_s']/max(a['wall_s'],1e-9):.1f}x, "
                f"shuffle_write {b['shuffle_write_mb']/max(a['shuffle_write_mb'],1e-9):.1f}x, "
                f"tasks {b['tasks']}/{a['tasks']}",
                flush=True,
            )
    with open(os.path.join(_REPO_DIR, ".scratch", "rehearsal.json"), "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
