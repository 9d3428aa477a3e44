"""Seeded randomized property tests: each distributed operator is compared
against an independent, obviously-correct Python re-derivation on small random
inputs (deterministic seeds — no flakes, no hypothesis shrink cost in CI).

These cover the operators whose oracles share the most structure with the
Spark plan (as-of join, salted join, connected components): a DuckDB oracle
written with the same algebra could hide a shared misunderstanding; a
brute-force nested loop cannot.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from big_data_analytics_mini_projects_spark.operators.relational import (
    join_asof,
    join_salted,
)
from big_data_analytics_mini_projects_spark.operators.similarity import (
    connected_components,
)


def test_asof_join_matches_bruteforce(spark):
    """join_asof == per-left-row scan for the latest right row at ts' <= ts."""
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        keys = ["a", "b", "c"]
        left = [
            (k, rng.randrange(0, 50), i)
            for i, k in enumerate(rng.choices(keys, k=25))
        ]
        # unique (key, ts) on the right — the operator's documented precondition
        right_slots = {(k, t) for k in keys for t in rng.sample(range(50), 8)}
        right = [(k, t, f"p{k}{t}") for (k, t) in sorted(right_slots)]
        ldf = spark.createDataFrame(left, "k string, ts long, lid long")
        rdf = spark.createDataFrame(right, "k string, rts long, payload string")
        got = {
            (r["k"], r["ts"], r["lid"]): r["payload"]
            for r in join_asof(ldf, rdf, "k", "ts", "rts", ["payload"]).collect()
        }
        expect = {}
        for (k, t, lid) in left:
            prior = [(rt, p) for (rk, rt, p) in right if rk == k and rt <= t]
            if prior:
                expect[(k, t, lid)] = max(prior)[1]
        assert got == expect, f"seed {seed}"


def test_salted_join_matches_plain_join(spark):
    """join_salted is semantics-preserving: same multiset of output rows as
    the plain equi-join, for any salt fan-out."""
    for seed in (7, 8):
        rng = random.Random(seed)
        big = [
            (rng.randrange(0, 5), i, rng.randrange(0, 100))
            for i in range(200)
        ]
        small = [(k, f"g{k % 3}") for k in range(5) if rng.random() < 0.8]
        bdf = spark.createDataFrame(big, "k long, row_id long, val long")
        sdf = spark.createDataFrame(small, "k long, grp string")
        for n_salt in (1, 4):
            got = sorted(
                (r["k"], r["row_id"], r["val"], r["grp"])
                for r in join_salted(bdf, sdf, "k", F.col("row_id"), n_salt=n_salt).collect()
            )
            plain = sorted(
                (r["k"], r["row_id"], r["val"], r["grp"])
                for r in bdf.join(sdf, "k").collect()
            )
            assert got == plain, f"seed {seed} n_salt {n_salt}"


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    """Min-label propagation == classic union-find, including multi-hop
    chains longer than one propagation round."""
    for seed in (11, 12):
        rng = random.Random(seed)
        nodes = list(range(30))
        edges = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(18)
            }
        )
        # add one long path to force >2 propagation rounds
        path = [100, 101, 102, 103, 104, 105]
        edges += list(zip(path, path[1:]))
        pdf = spark.createDataFrame(edges, "ka long, kb long")
        got = {
            r["node"]: r["label"] for r in connected_components(pdf).collect()
        }
        assert got == _union_find_components(edges), f"seed {seed}"
