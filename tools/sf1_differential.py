"""Value-exact differential at 10x: run declared queries against BOTH engines
on the .scratch/sf1 (or sf1f) rehearsal dataset and assert the driver-style
row-count + schema + value equality (tests/compare.assert_df_equal — stricter
than the driver: floats exact).

The per-round correctness gate stops at sf0.1; the scale rehearsal
(tools/scale_rehearsal.py) times 10x runs but never checks values. This tool
closes that gap for flagship queries whose DuckDB oracle is itself linear in
the data (the all-pairs-oracle queries — minhash_jaccard etc. — stay out:
their ORACLES are quadratic by construction, not the engine plans).

Usage: python tools/sf1_differential.py [--dir=.scratch/sf1] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

import duckdb

from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.session import get_spark
from tests.compare import assert_df_equal

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Flagship defaults: one per major family, linear-oracle only.
DEFAULT_QUERIES = [
    "tpch_q1_pricing_summary",
    "dedup_exact",
    "lang_id_ngram",
    "pack_sequences_2048",
    "incremental_snapshot_merge",
    "welford_global_stats",
    "ols_simple_words",
]


def main() -> None:
    argv = sys.argv[1:]
    data_dir = os.path.join(_REPO_DIR, ".scratch", "sf1")
    names = []
    for a in argv:
        if a.startswith("--dir="):
            data_dir = os.path.abspath(a.split("=", 1)[1])
        else:
            names.append(a)
    names = names or DEFAULT_QUERIES

    spark = get_spark("bdamp-sf1-differential")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{data_dir}/{t}.parquet')"
        )

    failures = []
    for name in names:
        spec = QUERIES[name]
        if spec.oracle is None:
            print(f"SKIP {name}: no oracle", flush=True)
            continue
        t0 = time.perf_counter()
        try:
            assert_df_equal(spec.build(spark, data_dir), duck, spec.oracle)
            print(
                f"PASS {name} ({time.perf_counter() - t0:.1f}s)", flush=True
            )
        except AssertionError as e:
            failures.append(name)
            print(f"FAIL {name}: {e}", flush=True)
        spark.catalog.clearCache()
    if failures:
        sys.exit(f"{len(failures)} differential failures: {failures}")
    print(f"all {len(names)} value-exact at {os.path.basename(data_dir)}")


if __name__ == "__main__":
    main()
