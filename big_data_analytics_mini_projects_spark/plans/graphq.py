"""Graph analytics over the relational testdata (beyond-reference; extends
the iterative-algorithm family started by connected components,
operators/similarity.py:212).

PageRank here runs over the bipartite supplier<->customer trade graph
(edges = lineitem counts via orders), made strongly usable by adding both
edge directions — every node then has out-edges, so no dangling-mass term
is needed and the recurrence is exactly

    r_{t+1}(v) = 0.15/N + 0.85 * sum_{(u,v) in E} r_t(u) * w(u,v)/outw(u)

Scale design (100 TB):
- Edge list built once (join + groupBy), persisted, reused by all
  iterations; the transition probability w/outw is precomputed so each
  iteration is ONE unhinted join (ranks are |V| rows — AQE decides) plus
  ONE groupBy(dst) shuffle. The only driver round trip is the scalar |V|
  (the bounded scalar-collect class); rank vectors never leave the cluster.
- Three iterations are unrolled in the DuckDB oracle, so the differential
  test pins the full iterative computation, not just one step.
- Output is rank * N (relative rank, ~1.0 scale) rounded to 4 — stable to
  cross-engine double-summation-order noise (~1e-13 relative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_table
from ..functions.text import round_stable, sql_round_stable
from .registry import register
from ..caching import checkpoint_shared, persist_tracked

from .shared import DAMPING, N_PR_ITERS  # noqa: E402  (values in shared.py since round 8)


def _pagerank_oracle(iters: int = N_PR_ITERS, materialized: bool = False) -> str:
    """``materialized=True`` is the scale form: identical SQL except the
    multiply-referenced CTEs carry DuckDB's AS MATERIALIZED hint. Without
    it DuckDB inlines e0 into e (twice), e into outw+ed, and ed into every
    unrolled iteration — the 60M-row lineitem join re-evaluates ~12x at
    sf10f and the stacked spills exceed a single box's temp disk. With it
    the transition matrix materializes once (the exact analogue of the
    engine's persisted `edges` frame). Result-identical; pinned equal at
    base SFs by tests/test_scale_tools.py."""
    m = " MATERIALIZED" if materialized else ""
    head = (
        f"WITH e0 AS{m} (SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src, "
        "'c' || CAST(o_custkey AS VARCHAR) AS dst, COUNT(*) AS w "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2), "
        f"e AS{m} (SELECT src, dst, w FROM e0 "
        "UNION ALL SELECT dst AS src, src AS dst, w FROM e0), "
        "outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src), "
        f"ed AS{m} (SELECT e.src, e.dst, e.w / outw.ow AS p "
        "FROM e JOIN outw USING (src)), "
        "nn AS (SELECT COUNT(*) AS n FROM outw), "
        "r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS r FROM outw)"
    )
    steps = "".join(
        f", r{t} AS (SELECT ed.dst AS node, "
        f"0.15 / (SELECT n FROM nn) + {DAMPING} * SUM(r.r * ed.p) AS r "
        f"FROM ed JOIN r{t - 1} r ON ed.src = r.node GROUP BY ed.dst)"
        for t in range(1, iters + 1)
    )
    tail = (
        f" SELECT node, " + sql_round_stable("r * (SELECT n FROM nn)") + " AS rank_rel "
        f"FROM r{iters}"
    )
    return head + steps + tail


@register(
    "pagerank_trade_graph",
    oracle=_pagerank_oracle(),
    scale_oracle=_pagerank_oracle(materialized=True),
    doc="Three unrolled PageRank iterations (damping 0.85) over the "
    "bidirectional supplier<->customer trade graph (edge weight = lineitem "
    "count): edges+transition probabilities built once and persisted, each "
    "iteration one unhinted rank join (AQE decides) + one groupBy(dst) "
    "shuffle; the only driver round trip is the scalar node count. The "
    "oracle unrolls the same three iterations in SQL, pinning the whole "
    "iterative computation. Output is relative rank (r*N) per node.",
    tags=("pagerank", "graph", "iterative"),
)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Transition matrix, built once and reused by every iteration — a
    # checkpoint_shared leaf (round 12): repeats skip re-analyzing the
    # lineitem-join derivation, and the leaf preserves the repartition's
    # hash(src) partitioning so each iteration still exchanges only the
    # |V|-row ranks frame — measured at the 100x rehearsal (sf10f, 120M
    # directed edges) this is the difference between re-shuffling ~1.5 GB
    # of edges per iteration and the per-iteration floor (ranks +
    # groupBy(dst) only).
    def _edges() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        # Cached: the union's two branches, the out-weight aggregate, and
        # the transition join all read e0 — without this the lineitem join
        # runs 4x.
        e0 = persist_tracked(
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                    "src"
                ),
                F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                    "dst"
                ),
            )
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("w"))
        )
        e = e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
        outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
        return persist_tracked(
            e.join(outw, "src")
            .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
            .repartition(F.col("src"))
        )

    edges = checkpoint_shared("graphq.pr_edges", sf_dir, _edges)
    nodes = checkpoint_shared(
        "graphq.pr_nodes",
        sf_dir,
        lambda: persist_tracked(edges.select(F.col("src").alias("node")).distinct()),
    )
    # |V| as a driver scalar — the bounded scalar-collect class (same as the
    # two-pass sampler's entity count); deriving it from the PERSISTED edge
    # cache keeps the expensive lineitem join from being rebuilt per use.
    n = nodes.count()
    # NOTE (round 12): the per-iteration rank frames deliberately stay
    # UN-materialized, unlike the convergence curve's (whose r10 form
    # already persisted them): here the final ranks IS the query result,
    # and leafing the chain would turn every bench repeat into a cached
    # read of the answer — result caching, not optimization. Each repeat
    # recomputes the full iteration chain from the cached transition
    # matrix, exactly as before.
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    for _ in range(N_PR_ITERS):
        ranks = (
            # ranks is |V| rows — scales with the data, so no broadcast hint.
            edges.join(ranks, edges.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("p")).alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(0.15 / n) + F.lit(DAMPING) * F.col("s")).alias("r"),
            )
        )
    return ranks.select("node", round_stable(F.col("r") * n).alias("rank_rel"))
