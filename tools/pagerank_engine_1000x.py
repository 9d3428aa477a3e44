"""Engine-only PageRank run at 1000x (round-6 verdict item 4).

The DuckDB oracle cannot run pagerank_trade_graph at sf100f on one box
(BASELINE.md addendum 9: the unrolled 3-iteration SQL's spill crossed the
disk guard), so the cross-engine bar for PageRank stays the full 100x pass.
This script closes the remaining gap — "engine side untested at 1000x" —
by running the ENGINE at sf100f (150M orders / 600M lineitem -> ~1.2B
directed weighted edges) and recording:

- wall seconds (cold, single run — comparable to the sf1_differential
  engine columns, which are also cold);
- n_nodes and sum(rank_rel): PageRank over a graph with no dangling nodes
  (the bidirectional construction guarantees out-edges everywhere)
  preserves total rank mass, so sum(r) == 1 and therefore
  sum(rank_rel) == sum(r * N) == N up to float tolerance — an
  end-to-end invariant of the whole iterate-join-aggregate pipeline that
  does not depend on the oracle.

No anchored replica comparison is possible here: make_sf1 keeps
l_suppkey UNOFFSET across replicas (suppliers are shared hubs), so the
scaled graph is one connected component whose ranks genuinely differ from
the base — by design, that is also what makes it a skew-realistic 1000x
graph (supplier degree grows 1000x).

Usage: python tools/pagerank_engine_1000x.py [--dir=.scratch/sf100f]
"""

from __future__ import annotations

import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import SparkSession, functions as F

from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.session import RUNTIME_CONFS


def main() -> None:
    sf_dir = os.path.join(_REPO_DIR, ".scratch", "sf100f")
    for a in sys.argv[1:]:
        if a.startswith("--dir="):
            sf_dir = os.path.abspath(a.split("=", 1)[1])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 128 shuffle partitions: the documented sf100 sizing rule
    # (tools/scale_rehearsal.py) — 32 would put ~600 MB of shuffle read in
    # one task at this scale.
    shuffle_parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "128"))
    builder = (
        SparkSession.builder.appName("bdamp-pagerank-1000x")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spec = QUERIES["pagerank_trade_graph"]
    t0 = time.perf_counter()
    out = spec.build(spark, sf_dir)
    row = out.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("rank_rel").alias("sum_rank_rel"),
        F.min("rank_rel").alias("min_rr"),
        F.max("rank_rel").alias("max_rr"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    n, s = row["n_nodes"], row["sum_rank_rel"]
    rel_err = abs(s - n) / n
    print(
        f"PAGERANK_1000X dir={sf_dir} wall_s={wall:.1f} n_nodes={n} "
        f"sum_rank_rel={s:.4f} rel_mass_err={rel_err:.2e} "
        f"min={row['min_rr']} max={row['max_rr']}"
    )
    # mass conservation: sum(rank_rel) == N. Tolerance covers the 4-decimal
    # per-node rounding (round_stable) summed over N nodes plus float
    # accumulation: generous 1e-4 relative.
    assert rel_err < 1e-4, f"rank mass not conserved: {s} vs {n}"
    print("PASS: rank mass conserved at 1000x")


if __name__ == "__main__":
    main()
