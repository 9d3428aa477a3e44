"""CF parity test: the DataFrame operators vs a pure-Python replica of the
reference algorithm (a3_p2.py find_similar/calculate) on a small fixture —
independently validating the sufficient-statistics expansion."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_analytics_mini_projects_spark.operators.recommend import (
    cf_filter_ratings,
    cf_item_similarities,
    cf_predict,
)

# (user, item, rating): 4 items over 6 users, hand-sized so every item has
# >=3 users and every user >=2 items (filters relaxed below).
RATINGS = [
    ("u1", "A", 5), ("u1", "B", 3), ("u1", "C", 4),
    ("u2", "A", 4), ("u2", "B", 2), ("u2", "D", 5),
    ("u3", "A", 1), ("u3", "C", 2), ("u3", "D", 4),
    ("u4", "B", 5), ("u4", "C", 3), ("u4", "D", 2),
    ("u5", "A", 3), ("u5", "B", 4), ("u5", "C", 5), ("u5", "D", 1),
    ("u6", "A", 2), ("u6", "D", 3),
    # E tracks A over u1-u3 -> third positive-sim neighbor of A, so a k=2
    # neighbor cap has something to drop (test_cf_predict_neighbor_cap)
    ("u1", "E", 5), ("u2", "E", 4), ("u3", "E", 1),
]


def _ref_similarity(target: str):
    """find_similar (a3_p2.py:37-49): numerator over common users, each vector
    centered by its own full-support mean, norms over full support."""
    by_item: dict[str, dict[str, float]] = {}
    for u, i, r in RATINGS:
        by_item.setdefault(i, {})[u] = float(r)
    tv = by_item[target]
    t_mean = sum(tv.values()) / len(tv)
    t_cent = {u: v - t_mean for u, v in tv.items()}
    t_norm = math.sqrt(sum(v * v for v in t_cent.values()))
    sims = {}
    for item, vec in by_item.items():
        common = set(vec) & set(t_cent)
        if len(common) < 2:
            continue
        m = sum(vec.values()) / len(vec)
        cent = {u: v - m for u, v in vec.items()}
        num = sum(t_cent[u] * cent[u] for u in common)
        den = t_norm * math.sqrt(sum(v * v for v in cent.values()))
        sim = num / den
        if sim > 0:
            sims[item] = sim
    return sims


def test_cf_similarity_matches_reference_semantics(spark):
    rdf = spark.createDataFrame(RATINGS, "user_id string, item string, rating long")
    rf = cf_filter_ratings(rdf, min_users_per_item=3, min_items_per_user=2)
    sims = cf_item_similarities(rf, F.col("item_a") == "A")
    got = {r["item_b"]: r["sim"] for r in sims.collect()}
    want = _ref_similarity("A")
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert got["A"] == pytest.approx(1.0, abs=1e-12)  # self-similarity kept


def test_cf_predict_matches_reference_semantics(spark):
    rdf = spark.createDataFrame(RATINGS, "user_id string, item string, rating long")
    rf = cf_filter_ratings(rdf, min_users_per_item=3, min_items_per_user=2)
    sims = cf_item_similarities(rf, F.col("item_a") == "A")
    preds = {r["user_id"]: r["pred"] for r in cf_predict(rf, sims, quantize=None).collect()}

    want_sims = _ref_similarity("A")
    ratings_by_user: dict[str, dict[str, float]] = {}
    for u, i, r in RATINGS:
        ratings_by_user.setdefault(u, {})[i] = float(r)
    for u, rated in ratings_by_user.items():
        overlap = set(rated) & set(want_sims)
        if len(overlap) < 2:
            assert u not in preds
            continue
        if "A" in rated:  # pass-through (a3_p2.py:54-55)
            assert preds[u] == pytest.approx(rated["A"], abs=1e-9)
        else:
            num = sum(rated[i] * want_sims[i] for i in overlap)
            den = sum(want_sims[i] for i in overlap)
            assert preds[u] == pytest.approx(round(num / den, 4), abs=1e-4)


def test_cf_predict_neighbor_cap(spark):
    """k caps each target's neighborhood to the k most-similar items (the
    spec's 'Use 50 neighbors'); k=None keeps reference-code behavior."""
    rdf = spark.createDataFrame(RATINGS, "user_id string, item string, rating long")
    rf = cf_filter_ratings(rdf, min_users_per_item=3, min_items_per_user=2)
    sims = cf_item_similarities(rf, F.col("item_a") == "A")
    want_sims = _ref_similarity("A")
    assert len(want_sims) >= 3  # the k=2 cap below must actually drop items

    # k=2 keeps only the 2 highest-sim neighbors (self-pair sim=1.0 included)
    top2 = set(sorted(want_sims, key=lambda i: (-want_sims[i], i))[:2])
    capped = {r["user_id"]: r["pred"] for r in cf_predict(rf, sims, quantize=None, k=2).collect()}
    ratings_by_user: dict[str, dict[str, float]] = {}
    for u, i, r in RATINGS:
        ratings_by_user.setdefault(u, {})[i] = float(r)
    for u, rated in ratings_by_user.items():
        overlap = set(rated) & top2
        if len(overlap) < 2:
            assert u not in capped
            continue
        if "A" in rated:
            assert capped[u] == pytest.approx(rated["A"], abs=1e-9)
        else:
            num = sum(rated[i] * want_sims[i] for i in overlap)
            den = sum(want_sims[i] for i in overlap)
            assert capped[u] == pytest.approx(round(num / den, 4), abs=1e-4)

    # a cap larger than the candidate set is a no-op vs k=None
    uncapped = {r["user_id"]: r["pred"] for r in cf_predict(rf, sims, quantize=None).collect()}
    wide = {r["user_id"]: r["pred"] for r in cf_predict(rf, sims, quantize=None, k=100).collect()}
    assert wide == uncapped


def test_cf_predict_k50_plan_bounds_fanout(spark, sf_dir):
    """The pipeline-default k50 path must carry its fan-out bound in the
    PHYSICAL plan (round-4 verdict item 4): a row_number window partitioned
    on the target item, cut at <= 50, feeding the ratings join — so each
    target contributes at most k weight rows no matter how the corpus
    grows. The uncapped reference-parity twin must NOT have the window
    (that absence is exactly its measured 18.1x densification at 10x)."""
    from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES

    import contextlib
    import io
    import re

    def plan_of(name: str) -> str:
        # Public explain() captured from stdout (round-5 ADVICE: no JVM
        # bridge internals) — 'formatted' mode includes the operator
        # details with full windowspecdefinition expressions.
        df = QUERIES[name].build(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    # the cap's signature: row_number over (PARTITION BY item_a ORDER BY sim
    # DESC) — distinct from the ratings-dedupe windows, which partition on
    # (user_id, item). Both plans carry the dedupe windows; only k50 may
    # carry the cap window.
    cap_window = re.compile(r"windowspecdefinition\(item_a#\d+L?, sim#\d+ DESC")
    cap_filter = re.compile(r"_rk#\d+L? <= 50")

    capped = plan_of("cf_predict_ratings_k50")
    assert cap_window.search(capped), "per-target neighbor-cap window missing from k50 plan"
    assert cap_filter.search(capped), "k=50 cutoff filter missing from k50 plan"
    # Spark >= 3.5 additionally pushes the rank filter into the window
    # operator itself (WindowGroupLimit): each partition stops producing
    # rows past rank 50 instead of materializing then filtering. Version-
    # gated (round-5 ADVICE) — the cap window + filter asserts above are
    # the portable contract.
    major, minor = (int(x) for x in spark.version.split(".")[:2])
    if (major, minor) >= (3, 5):
        assert "WindowGroupLimit" in capped

    uncapped = plan_of("cf_predict_ratings")
    assert not cap_window.search(uncapped), (
        "uncapped reference-parity plan unexpectedly grew a neighbor-cap window"
    )
