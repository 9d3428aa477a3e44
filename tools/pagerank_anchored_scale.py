"""Anchored PageRank differential at 100x/1000x via a DISJOINT scaled graph.

Round-7 verdict item 3: pagerank_trade_graph's 1000x story was blocked on
both engines by single-box disk (BASELINE.md round-7 addendum 3) — the
sf100f construction shares suppliers across replicas, so the scaled graph
is one connected component whose ranks genuinely differ from the base and
no slice is oracle-comparable without running the full oracle (disk-bound).

This tool closes the gap with the bm25f/addendum-5 ANCHOR technique, made
EXACT here by a purpose-built scaled variant:

  ``sfNd`` ("disjoint") offsets l_suppkey/o_custkey/l_orderkey/o_orderkey
  per replica (same offset constants as tools/make_sf1.py, plus the
  suppkey offset make_sf1 deliberately omits), so the trade graph becomes
  K disjoint, pairwise-isomorphic copies of the base sf0.1 graph.

PageRank is linear in the teleport vector and block-diagonal over disjoint
components: with uniform init 1/(K*N_base) and teleport 0.15/(K*N_base),
every component's rank vector is exactly the base vector scaled by 1/K.
The catalog query outputs rank_rel = r * N_total = r_base * N_base — i.e.

  INVARIANT (anchor identity): replica-0's rank_rel == the BASE run's
  rank_rel, node for node, to float-rounding tolerance;
  INVARIANT (mass): sum(rank_rel) == N_total over the full scaled output.

So the cross-engine contract at scale is: run the UNMODIFIED catalog query
on the full K-replica graph (the engine genuinely builds and iterates
K*1.17M directed edges), slice the 16k replica-0 nodes out of the result,
and compare them value-by-value against the DuckDB oracle run at sf0.1 —
a differential whose oracle side is BASE-SCALE (seconds, no disk), while
the engine side is the full 100x/1000x execution. The mass invariant
covers the (K-1)/K of the output the anchor does not touch: any per-node
error elsewhere would have to cancel exactly in the sum to slip through,
and the anchor pins the per-node computation path bit-for-bit.

The tables are PRUNED to the two columns pagerank reads (l_orderkey,
l_suppkey / o_orderkey, o_custkey): the point is the graph computation,
not re-materializing 11 GB of untouched TPC-H value columns. Everything
else symlinks sf0.1 (the query never reads it).

A disk-guard thread aborts the run if free space falls below GUARD_GB
(the round-7 attempt died by filling the disk to 0 — never again), and
peak disk use is recorded either way.

Usage:
  python tools/pagerank_anchored_scale.py --replicas=100          # 100x
  python tools/pagerank_anchored_scale.py --replicas=1000         # 1000x
  SPARK_GRAFT_DRIVER_MEM=96g python tools/pagerank_anchored_scale.py ...
"""

from __future__ import annotations

import os
import shutil
import sys
import threading
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

import duckdb
from pyspark.sql import SparkSession, functions as F

from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.plans.graphq import _pagerank_oracle
from big_data_analytics_mini_projects_spark.session import RUNTIME_CONFS

SRC = "/root/testdata/sf0.1"
#: Same per-replica offsets as tools/make_sf1.py (orderkey +r*1e8,
#: custkey +r*1e7) plus the suppkey offset (+r*1e7) that makes replicas
#: disjoint. Base ids are < 2e5 (suppkey < 1e3, custkey < 1.5e4), so the
#: offsets are collision-free for thousands of replicas; suppkey and
#: custkey share an offset safely because node ids carry the 's'/'c' tag.
ORDER_OFF = 100_000_000
KEY_OFF = 10_000_000
GUARD_GB = 6.0


def build(replicas: int, dst: str) -> None:
    """Materialize the pruned disjoint tables (idempotent, atomic rename —
    the make_sf1._copy contract)."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({replicas})) AS rep")
    for name, sql in (
        (
            "lineitem",
            f"SELECT l.l_orderkey + r.rep * {ORDER_OFF} AS l_orderkey, "
            f"l.l_suppkey + r.rep * {KEY_OFF} AS l_suppkey "
            f"FROM read_parquet('{SRC}/lineitem.parquet') l CROSS JOIN r",
        ),
        (
            "orders",
            f"SELECT o.o_orderkey + r.rep * {ORDER_OFF} AS o_orderkey, "
            f"o.o_custkey + r.rep * {KEY_OFF} AS o_custkey "
            f"FROM read_parquet('{SRC}/orders.parquet') o CROSS JOIN r",
        ),
    ):
        out = os.path.join(dst, f"{name}.parquet")
        if os.path.exists(out):
            continue
        tmp = out + ".tmp"
        if os.path.exists(tmp):
            os.remove(tmp)
        t0 = time.perf_counter()
        con.execute(f"COPY ({sql}) TO '{tmp}' (FORMAT PARQUET)")
        os.rename(tmp, out)
        print(
            f"BUILD {name} x{replicas}: {os.path.getsize(out) / 1e9:.2f} GB "
            f"in {time.perf_counter() - t0:.0f}s",
            flush=True,
        )
    for t in ("region", "nation", "customer", "supplier", "part",
              "events", "documents", "embeddings"):
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)


class DiskGuard(threading.Thread):
    """Abort the JVM-side run before the disk hits 0 (round-7 lesson)."""

    def __init__(self, spark: SparkSession):
        super().__init__(daemon=True)
        self.spark = spark
        self.min_free_gb = shutil.disk_usage("/").free / 1e9
        self.tripped = False
        self._stop = threading.Event()

    def run(self) -> None:
        while not self._stop.wait(5.0):
            free = shutil.disk_usage("/").free / 1e9
            self.min_free_gb = min(self.min_free_gb, free)
            if free < GUARD_GB:
                self.tripped = True
                print(
                    f"DISK GUARD TRIPPED at {free:.1f} GB free — cancelling",
                    flush=True,
                )
                try:
                    self.spark.sparkContext.cancelAllJobs()
                except Exception:
                    pass
                return

    def stop(self) -> None:
        self._stop.set()


def main() -> None:
    replicas = 100
    curve = False
    for a in sys.argv[1:]:
        if a.startswith("--replicas="):
            replicas = int(a.split("=", 1)[1])
        if a == "--curve":
            curve = True
    dst = os.path.join(_REPO_DIR, ".scratch", f"pr_disjoint_x{replicas}")
    build(replicas, dst)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "128"))
    builder = (
        SparkSession.builder.appName(f"bdamp-pagerank-anchored-x{replicas}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        # Large heap so the 1.17B-row-per-1000-replica edges cache stays in
        # memory instead of spilling its ~30 GB to the disk that killed the
        # round-7 run; the box has 128 GiB.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "96g"))
        # Session-level (NOT query-level) scratch-disk levers for the x1000
        # single-box run — on a real cluster neither is needed (the edge
        # shuffle spreads across executor-local disks at ~70 MB each):
        # 1. let AQE broadcast the |V|-row out-weight frame (~400 MB at
        #    x1000), eliminating the 1.17B-edge SortMergeJoin re-shuffle in
        #    the transition-matrix build;
        .config("spark.sql.autoBroadcastJoinThreshold", "1g")
        # 3. zstd for shuffle files and spilled cache blocks (~30-40%
        #    smaller than the lz4 default at these string-keyed row shapes)
        #    and a higher protected-storage fraction so more of the two
        #    live edge caches stays in memory instead of spilling — the
        #    second x1000 attempt showed the un-freeable working set (e0 +
        #    transition-matrix caches, ~54 GB uncompressed) is what
        #    overflows the disk, not the GC-able shuffles.
        .config("spark.io.compression.codec", "zstd")
        .config("spark.memory.storageFraction", "0.7")
        # 2. shuffle files are only deleted when their ShuffleDependency is
        #    GC'd (ContextCleaner): with a 96g heap the driver may not GC
        #    for the whole run, so consumed phase-1 shuffles (the
        #    lineitem-join + pair-agg feeding the persisted e0 cache) sit on
        #    disk while phase-2 writes its own. A periodic System.gc() lets
        #    the cleaner turn cumulative footprint into per-phase peak.
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    guard = DiskGuard(spark)
    guard.start()

    def _gc_loop():
        while not guard._stop.is_set() and not guard.tripped:
            time.sleep(45.0)
            try:
                spark._jvm.System.gc()  # noqa: SLF001
            except Exception:
                return

    threading.Thread(target=_gc_loop, daemon=True).start()

    if curve:
        run_curve(spark, guard, dst, replicas)
        return

    spec = QUERIES["pagerank_trade_graph"]
    t0 = time.perf_counter()
    out = spec.build(spark, dst).persist()
    try:
        full = out.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("rank_rel").alias("sum_rank_rel"),
        ).collect()[0]
    except Exception:
        if guard.tripped:
            print(
                f"PAGERANK_ANCHORED x{replicas}: ABORTED by disk guard; "
                f"min_free_gb={guard.min_free_gb:.1f}",
                flush=True,
            )
            return
        raise
    wall = time.perf_counter() - t0

    # Anchor slice: replica-0 node ids are the UNOFFSET base ids.
    anchor = {
        r["node"]: r["rank_rel"]
        for r in out.filter(
            F.substring("node", 2, 100).cast("long") < KEY_OFF
        ).collect()
    }

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )
    base = {r[0]: r[1] for r in con.execute(_pagerank_oracle()).fetchall()}

    assert set(anchor) == set(base), (
        f"anchor node set mismatch: {len(anchor)} vs {len(base)}"
    )
    # Both sides round to 4 decimals; scaled-engine doubles may land on the
    # other side of a rounding boundary, so allow one last-digit ulp.
    diffs = [abs(anchor[n] - base[n]) for n in base]
    n_exact = sum(1 for d in diffs if d == 0.0)
    max_diff = max(diffs)
    n, s = full["n_nodes"], full["sum_rank_rel"]
    mass_err = abs(s - n) / n
    print(
        f"PAGERANK_ANCHORED x{replicas} dir={dst} wall_s={wall:.1f} "
        f"n_nodes={n} sum_rank_rel={s:.4f} rel_mass_err={mass_err:.2e} "
        f"anchor_nodes={len(base)} anchor_exact={n_exact} "
        f"anchor_max_abs_diff={max_diff:.6f} "
        f"min_free_gb={guard.min_free_gb:.1f}",
        flush=True,
    )
    guard.stop()
    assert n == replicas * len(base), (n, replicas, len(base))
    assert mass_err < 1e-6, mass_err
    assert max_diff <= 1.01e-4, max_diff
    print("PASS", flush=True)


def run_curve(spark, guard, dst: str, replicas: int) -> None:
    """pagerank_convergence_curve at scale via EXACT linearity: on the
    disjoint K-replica graph every node's per-iteration (r * N) terms equal
    the base graph's (see module docstring), and the curve's l1_delta /
    total_mass are sums of those per-node 4-decimal-rounded terms — so the
    scaled values must equal EXACTLY K x the base oracle's values (exact
    decimal sums of K identical copies). Engine runs the full scaled graph;
    the oracle runs at base sf0.1 — same shape as the anchor comparison,
    pinning all three iterations of the iterate-join-aggregate pipeline."""
    from big_data_analytics_mini_projects_spark.plans.round12q import (
        _sql_pr_curve_oracle,
    )

    spec = QUERIES["pagerank_convergence_curve"]
    t0 = time.perf_counter()
    try:
        got = {
            r["iteration"]: (r["n_nodes"], r["l1_delta"], r["total_mass"])
            for r in spec.build(spark, dst).collect()
        }
    except Exception:
        if guard.tripped:
            print(
                f"PAGERANK_CURVE x{replicas}: ABORTED by disk guard; "
                f"min_free_gb={guard.min_free_gb:.1f}",
                flush=True,
            )
            return
        raise
    wall = time.perf_counter() - t0

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )
    base = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_sql_pr_curve_oracle(materialized=True)).fetchall()
    }
    assert set(got) == set(base), (sorted(got), sorted(base))
    max_rel = 0.0
    for it, (n_b, l1_b, m_b) in base.items():
        n_g, l1_g, m_g = got[it]
        assert n_g == replicas * n_b, (it, n_g, n_b)
        for g, b in ((l1_g, replicas * l1_b), (m_g, replicas * m_b)):
            rel = abs(g - b) / max(abs(b), 1e-12)
            max_rel = max(max_rel, rel)
    print(
        f"PAGERANK_CURVE x{replicas} dir={dst} wall_s={wall:.1f} "
        f"iters={sorted(got)} max_rel_err_vs_Kx_base={max_rel:.2e} "
        f"min_free_gb={guard.min_free_gb:.1f}",
        flush=True,
    )
    guard.stop()
    assert max_rel <= 5e-7, max_rel
    print("PASS", flush=True)


if __name__ == "__main__":
    main()
