"""Per-query cost split: build() time (plan construction + any driver-side
iteration) vs noop-write execution time, plus Spark job count per phase.

Usage: python tools/profile_queries.py <name> [name ...]   (env as bench.py)

Two passes per query (pass 2 ~ the bench's min-of-3 steady state: persisted
intermediates hot, codegen warm). Guide §1: measure first, isolate with the
noop sink, label jobs.
"""

from __future__ import annotations

import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    from big_data_analytics_mini_projects_spark.sources.tables import (
        TABLE_NAMES,
        load_table,
    )

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    for name in names:
        spec = QUERIES.get(name)
        if spec is None:
            print(f"SKIP unknown {name}")
            continue
        for rep in (1, 2):
            sc.setJobGroup(f"{name}-build-{rep}", f"{name} build pass {rep}")
            t0 = time.perf_counter()
            df = spec.build(spark, sf_dir)
            t1 = time.perf_counter()
            build_jobs = len(sc.statusTracker().getJobIdsForGroup(f"{name}-build-{rep}"))
            sc.setJobGroup(f"{name}-exec-{rep}", f"{name} exec pass {rep}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            exec_jobs = len(sc.statusTracker().getJobIdsForGroup(f"{name}-exec-{rep}"))
            print(
                f"PROF {name} rep{rep}: build {t1-t0:.3f}s ({build_jobs} jobs) "
                f"+ exec {t2-t1:.3f}s ({exec_jobs} jobs) = {t2-t0:.3f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
