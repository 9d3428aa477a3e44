"""Unit tests for the round-10 fresh batch part 2 (aHash agreement audit,
SemDeDup K-sweep, dedup-state GC metrics). Full differential runs in
test_catalog_oracle; here: the local driver-gate mirror, the one-parse
two-fingerprint kernel vs both closed forms, and the cross-query
reconciliations (K=8 sweep row == semdedup_cells; GC metrics == the
tombstone disposition frame)."""

from __future__ import annotations

from collections import Counter

from big_data_analytics_mini_projects_spark.operators.multimodal import (
    synth_bmp_payloads,
)
from big_data_analytics_mini_projects_spark.operators.phash import (
    AH_BITS,
    AH_GRID_H,
    AH_GRID_W,
    phashes_bmp,
)
from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES

from .compare import assert_df_equal
from .test_round16q import _dhash_closed_form

R17 = ("dedup_image_ahash", "semdedup_k_sweep", "dedup_state_gc_metrics")


def test_round17q_differential(spark, duck, sf_dir):
    """Local mirror of the driver gate for all three."""
    for name in R17:
        spec = QUERIES[name]
        assert_df_equal(spec.build(spark, sf_dir), duck, spec.oracle)


def _ahash_closed_form(doc_id: int) -> int:
    from big_data_analytics_mini_projects_spark.operators.multimodal import (
        _bmp_dims,
        _bmp_pixel,
    )

    w, h = _bmp_dims(doc_id)
    grays = [
        sum(_bmp_pixel(doc_id, xc * w // AH_GRID_W, yr * h // AH_GRID_H))
        for yr in range(AH_GRID_H)
        for xc in range(AH_GRID_W)
    ]
    tot = sum(grays)
    hsh = 0
    for i, g in enumerate(grays):
        if g * AH_BITS > tot:
            hsh |= 1 << i
    return hsh


def test_phashes_kernel_matches_both_closed_forms(spark):
    """One byte parse, two fingerprints: the combined kernel must agree
    with BOTH independent pattern-derived closed forms, and its dhash
    column must be bit-identical to the single-hash kernel's contract
    (round16q's _dhash_closed_form is that contract's pin)."""
    docs = spark.range(100).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: (r["dhash"], r["ahash"])
        for r in phashes_bmp(synth_bmp_payloads(docs)).collect()
    }
    assert got == {
        d: (_dhash_closed_form(d), _ahash_closed_form(d)) for d in range(100)
    }


def test_ahash_agreement_semantics(spark, sf_dir):
    """keeper_id is the aHash exact-class min; agree is True exactly when
    it coincides with the dHash exact-class min (dedup_image_phash's ck).
    The two fingerprints partition the image space DIFFERENTLY (gradient
    signs vs above-mean cells), so the audit must discriminate: some docs
    agree (identical images collapse identically under any fingerprint —
    every identity class's own min doc trivially agrees) and some
    disagree (a doc whose aHash class min differs from its dHash class
    min) — neither all-True nor all-False."""
    rows = QUERIES["dedup_image_ahash"].build(spark, sf_dir).collect()
    assert rows and len({r["doc_id"] for r in rows}) == len(rows)
    amin = {}
    for r in rows:
        amin[r["ahash"]] = min(amin.get(r["ahash"], r["doc_id"]), r["doc_id"])
    dk = {
        r["doc_id"]: r["keeper_id"]
        for r in QUERIES["dedup_image_phash"].build(spark, sf_dir).collect()
        if r["status"] != "near_dup"  # exact-class keeper == dhash-class min
    }
    flags = Counter()
    for r in rows:
        assert r["keeper_id"] == amin[r["ahash"]]
        if r["doc_id"] in dk:
            assert r["agree"] == (r["keeper_id"] == dk[r["doc_id"]])
        flags[bool(r["agree"])] += 1
    assert flags[True] > 0 and flags[False] > 0
    # a doc that is BOTH class minima agrees by construction: doc 0 is the
    # global min, hence min of both its classes
    assert next(r for r in rows if r["doc_id"] == 0)["agree"]


def test_k_sweep_reconciles_semdedup_cells(spark, sf_dir):
    """The K=8 sweep row must equal semdedup_cells' dup accounting exactly
    (same centroids, same assignment, same tau), and every row obeys
    n_dups <= n_dup_pairs <= n_pairs_eval with K=2 evaluating the most
    pairs (two cells can only be coarser than sixteen)."""
    sweep = {
        r["k"]: r for r in QUERIES["semdedup_k_sweep"].build(spark, sf_dir).collect()
    }
    assert set(sweep) == {2, 4, 8, 16}
    cells = QUERIES["semdedup_cells"].build(spark, sf_dir).collect()
    assert sweep[8]["n_dups"] == sum(r["is_dup"] for r in cells)
    for r in sweep.values():
        assert r["n_dups"] <= r["n_dup_pairs"] <= r["n_pairs_eval"]
    assert sweep[2]["n_pairs_eval"] == max(r["n_pairs_eval"] for r in sweep.values())


def test_gc_metrics_reconcile_tombstones(spark, sf_dir):
    """The dashboard row is exactly the disposition frame's accounting."""
    t = QUERIES["dedup_state_tombstones"].build(spark, sf_dir).collect()
    c = Counter(r["status"] for r in t)
    g = QUERIES["dedup_state_gc_metrics"].build(spark, sf_dir).collect()
    assert len(g) == 1
    g = g[0]
    assert g["n_tombstoned"] == c["tombstoned"]
    assert g["n_rehomed"] == c.get("rehomed", 0)
    assert g["n_dup_in_delta"] == c.get("dup_in_delta", 0)
    assert g["n_promoted"] == c.get("promoted", 0)
    assert g["n_orphans"] == g["n_rehomed"] + g["n_dup_in_delta"] + g["n_promoted"]
    assert g["state_after"] == g["state_before"] - g["n_tombstoned"] + g["n_promoted"]
    assert g["state_before"] > g["n_tombstoned"]
