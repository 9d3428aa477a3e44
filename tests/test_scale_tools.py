"""Pins on the scale-rehearsal tooling contracts (round-4 verdict item 3 +
ADVICE): the quadratic-oracle anchor-slice bridge and the make_sf1 lockstep
guarantees the 10x differential claims rest on.
"""

from __future__ import annotations

from tools.sf1_differential import SCALE_SLICE
from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES


def test_scale_slice_noop_at_base_sf(spark, sf_dir):
    """The anchor-slice predicates restrict to replica 0 (ids < 1e7 =
    make_sf1's replica offset). On the driver's own single-replica data every
    predicate must be a NO-OP — that is what lets the driver's primary
    all-pairs oracle pin slice == full at the base SF while the 10x run
    checks the sliced result only."""
    for name, pred in SCALE_SLICE.items():
        df = QUERIES[name].build(spark, sf_dir)
        full = df.count()
        sliced = df.filter(pred).count()
        assert sliced == full, (
            f"{name}: slice '{pred}' drops {full - sliced} of {full} rows at "
            "base SF — the bridge's slice==full grounding is broken"
        )


def test_scale_oracles_equal_primary_oracles(duck):
    """Every scale-form oracle (the 100x-runnable rewrite the 10x/100x
    differential substitutes) must produce EXACTLY the primary driver-gate
    oracle's result at the base SF — oracle-vs-oracle inside DuckDB, no
    Spark involved. This is the grounding that lets the structurally
    independent scatter form remain the driver oracle while the wide form
    carries the scale check."""
    import pandas as pd

    checked = 0
    for name, spec in QUERIES.items():
        if spec.scale_oracle is None:
            continue
        checked += 1
        a = duck.execute(spec.oracle).df()
        b = duck.execute(spec.scale_oracle).df()
        a = a.sort_values(list(a.columns)).reset_index(drop=True)
        b = b.sort_values(list(b.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_exact=True, obj=name)
    assert checked >= 2  # dedup_minhash_lsh + dedup_apply_canonical


def test_embedding_transform_is_a_distinct_isometry_per_replica():
    """The scaled-embeddings construction (tools/make_sf1.embedding_transform_expr)
    must be an ISOMETRY within each replica (norms + pairwise dots exactly
    preserved, so every within-replica cosine relation of the base corpus
    survives) and a DISTINCT transform per replica for rep < dim*dim.
    Round-6 regression pin: the original pure rotation clamped to the
    identity for rep >= dim, making replicas 64..99 of the 100x build
    verbatim clones of replica 0."""
    import duckdb

    from tools.make_sf1 import embedding_transform_expr

    dim = 8
    expr = embedding_transform_expr(dim, rep="r.rep", col="e.embedding")
    con = duckdb.connect()
    # Two probe vectors with a known dot product, replicated across every
    # rep in [0, dim*dim) — past both the rotation period and the old bug's
    # rep >= dim clamp point.
    con.execute(
        f"""
        CREATE VIEW t AS
        SELECT r.rep, {expr.replace('e.embedding', 'e.a')} AS ta,
                      {expr.replace('e.embedding', 'e.b')} AS tb
        FROM (SELECT [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0] AS a,
                     [8.0, -7.0, 6.0, -5.0, 4.0, -3.0, 2.0, -1.0] AS b) e
        CROSS JOIN (SELECT unnest(range({dim * dim})) AS rep) r
        """
    )
    rows = con.execute(
        """
        SELECT rep,
               list_aggregate(list_transform(ta, x -> x*x), 'sum') AS na,
               list_aggregate(list_transform(tb, x -> x*x), 'sum') AS nb,
               list_aggregate(list_transform(range(1, len(ta) + 1),
                                             i -> ta[i] * tb[i]), 'sum') AS dot,
               ta
        FROM t ORDER BY rep
        """
    ).fetchall()
    base_na = sum(x * x for x in [1, 2, 3, 4, 5, 6, 7, 8])
    base_nb = sum(x * x for x in [8, -7, 6, -5, 4, -3, 2, -1])
    base_dot = sum(
        x * y
        for x, y in zip([1, 2, 3, 4, 5, 6, 7, 8], [8, -7, 6, -5, 4, -3, 2, -1])
    )
    seen = set()
    for rep, na, nb, dot, ta in rows:
        assert len(ta) == dim, f"rep {rep}: transform changed the dimension"
        assert na == base_na and nb == base_nb, f"rep {rep}: norm not preserved"
        assert dot == base_dot, f"rep {rep}: pairwise dot not preserved"
        key = tuple(ta)
        assert key not in seen, f"rep {rep}: transform repeats an earlier replica"
        seen.add(key)


def test_scale_slice_queries_have_quadratic_primary_oracles():
    """The slice bridge exists ONLY for queries whose primary oracle cannot
    run whole at 100x on one box: all-pairs by construction
    (dedup_embedding_cosine) or a candidate materialization past the
    single-box disk budget (the cf_predict pair: |ratings| x k candidate
    rows + the user x item group hash — 78 GB of DuckDB spill measured at
    sf10f). Anything else must run the full differential at scale."""
    allowed = {
        "dedup_embedding_cosine",
        "cf_predict_ratings_k50",
        "cf_predict_ratings",
    }
    assert set(SCALE_SLICE) == allowed
    for name in SCALE_SLICE:
        assert name in QUERIES
        assert QUERIES[name].oracle is not None
