"""Distributed triangle counting (beyond-reference graph analytics,
extending the iterative family in plans/graphq.py).

Algorithm: degree-ordered edge orientation (the MapReduce node-iterator of
Suri & Vassilvitskii 2011, "Counting Triangles and the Curse of the Last
Reducer"). Each undirected edge is oriented from its lower-(degree, id)
endpoint to the higher one; wedges are enumerated by joining oriented edges
head-to-tail and closed by a third equi-join. Orientation bounds every
node's out-degree by O(sqrt(m)), so total wedge fan-out is O(m^{3/2})
regardless of skew — the hub that breaks the naive formulation (its
deg^2 wedges) emits nothing, because a hub is the HIGH end of almost all
its edges.

Shuffle census: two groupBy's (canonical edges, degrees), two equi-joins to
attach endpoint degrees, one wedge join, one closing join, one global count.
No windows, no driver round trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..caching import persist_tracked


def triangle_count(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Count distinct triangles in the undirected simple graph induced by
    ``edges`` (self-loops dropped, direction and duplicates ignored).
    Returns a single row (n_nodes, n_edges, n_triangles)."""
    und = persist_tracked(
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    lower_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = persist_tracked(
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    w1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    w2 = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    wedges = w1.join(w2, "y").select("x", "y", "z")
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tris = wedges.join(closing, ["x", "z"])
    return (
        tris.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(und.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(deg.agg(F.count(F.lit(1)).alias("n_nodes")))
        .select("n_nodes", "n_edges", "n_triangles")
    )
