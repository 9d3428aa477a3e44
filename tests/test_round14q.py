"""Unit tests for the round-9 fresh batch: incremental MinHash-LSH dedup
state maintenance. The full differential against the DuckDB oracles runs in
test_catalog_oracle; here we pin the local driver-gate mirror plus the
cross-family reconciliation with dedup_cross_snapshot (identical shingle/
signature/band/verify regime, so the pair sets must agree exactly)."""

from __future__ import annotations

from collections import defaultdict

from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.plans.round14q import SC_STEPS

from .compare import assert_df_equal


def test_round14q_differential(spark, duck, sf_dir):
    """Local mirror of the driver gate for both round-9 fresh queries."""
    for name in ("dedup_state_compaction", "dedup_compaction_curve"):
        spec = QUERIES[name]
        assert_df_equal(spec.build(spark, sf_dir), duck, spec.oracle)


def test_state_compaction_dispositions(spark, sf_dir):
    """Every delta (odd) doc gets exactly one disposition; keepers obey the
    greedy MIN rule: dup_of_state keepers are state (even) docs, dup_in_delta
    keepers are SMALLER delta (odd) docs, new canonicals keep themselves."""
    rows = QUERIES["dedup_state_compaction"].build(spark, sf_dir).collect()
    assert rows
    assert all(r["doc_id"] % 2 == 1 for r in rows)
    assert len({r["doc_id"] for r in rows}) == len(rows)
    statuses = {r["status"] for r in rows}
    assert statuses <= {"dup_of_state", "dup_in_delta", "new_canonical"}
    for r in rows:
        if r["status"] == "dup_of_state":
            assert r["keeper_id"] % 2 == 0
        elif r["status"] == "dup_in_delta":
            assert r["keeper_id"] % 2 == 1 and r["keeper_id"] < r["doc_id"]
        else:
            assert r["keeper_id"] == r["doc_id"]


def test_state_compaction_reconciles_with_cross_snapshot(spark, sf_dir):
    """Same corpus, same 16/4/4 regime, same parity split as
    dedup_cross_snapshot (round6q) — so the dup_of_state rows must be
    EXACTLY the per-doc_b MIN-doc_a reduction of its verified pair set."""
    xs = QUERIES["dedup_cross_snapshot"].build(spark, sf_dir).collect()
    want = defaultdict(list)
    for r in xs:  # doc_a even (state), doc_b odd (delta)
        want[r["doc_b"]].append(r["doc_a"])
    want_min = {d: min(ks) for d, ks in want.items()}
    got = {
        r["doc_id"]: r["keeper_id"]
        for r in QUERIES["dedup_state_compaction"].build(spark, sf_dir).collect()
        if r["status"] == "dup_of_state"
    }
    assert got == want_min


def test_compaction_curve_accounting(spark, sf_dir):
    """Per-step dispositions partition the delta; state_size is the running
    sum of new canonicals; the three cohorts cover the whole corpus; step 0
    cannot absorb dups into an empty state."""
    rows = sorted(
        QUERIES["dedup_compaction_curve"].build(spark, sf_dir).collect(),
        key=lambda r: r["step"],
    )
    assert [r["step"] for r in rows] == list(range(SC_STEPS))
    assert rows[0]["n_dup_state"] == 0
    running = 0
    total = 0
    for r in rows:
        assert r["n_dup_state"] + r["n_dup_delta"] + r["n_new"] == r["n_delta"]
        running += r["n_new"]
        assert r["state_size"] == running
        total += r["n_delta"]
    n_docs = (
        QUERIES["dedup_state_compaction"].build(spark, sf_dir).count() * 2
    )  # odd half == half the corpus at even corpus sizes
    from big_data_analytics_mini_projects_spark.sources.tables import load_table

    assert total == load_table(spark, sf_dir, "documents").count()
    assert n_docs in (total, total + 1)  # parity split sanity
