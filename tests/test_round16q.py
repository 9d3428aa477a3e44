"""Unit tests for the round-10 fresh batch (perceptual-hash image dedup,
SemDeDup semantic dedup, dedup-state tombstone fold). The full differential
against the DuckDB oracles runs in test_catalog_oracle; here we pin the
local driver-gate mirror, the REAL-byte-path-vs-closed-form parity of the
dHash kernel, the cross-family reconciliations (kmeans_lloyd_step cells,
dedup_state_compaction dispositions), and — on a handcrafted corpus — the
tombstone fold's rehomed / dup_in_delta / promoted paths, which the
synthetic testdata corpus does not all exercise (it only produces
'promoted' orphans at driver SFs)."""

from __future__ import annotations

import os
from collections import Counter

import duckdb

from big_data_analytics_mini_projects_spark.operators.multimodal import (
    _bmp_dims,
    _bmp_pixel,
    synth_bmp_payloads,
)
from big_data_analytics_mini_projects_spark.operators.phash import (
    PH_GRID_H,
    PH_GRID_W,
    dhash_bmp,
)
from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.plans.round16q import TOMB_MOD

from .compare import assert_df_equal

R16 = ("dedup_image_phash", "semdedup_cells", "dedup_state_tombstones")


def test_round16q_differential(spark, duck, sf_dir):
    """Local mirror of the driver gate for all three round-10 fresh queries."""
    for name in R16:
        spec = QUERIES[name]
        assert_df_equal(spec.build(spark, sf_dir), duck, spec.oracle)


def _dhash_closed_form(doc_id: int) -> int:
    """Independent pure-python derivation of the dHash from the pixel
    pattern (NOT via bytes) — the oracle's closed form."""
    w, h = _bmp_dims(doc_id)
    hsh = 0
    for yr in range(PH_GRID_H):
        sy = yr * h // PH_GRID_H
        grays = [
            sum(_bmp_pixel(doc_id, xc * w // PH_GRID_W, sy)) for xc in range(PH_GRID_W)
        ]
        for xc in range(PH_GRID_W - 1):
            if grays[xc + 1] > grays[xc]:
                hsh |= 1 << (yr * (PH_GRID_W - 1) + xc)
    return hsh


def test_dhash_kernel_matches_closed_form(spark):
    """The kernel parses REAL BMP bytes (header offsets, bottom-up rows,
    padding); the closed form never touches bytes. Agreement over 100
    doc_ids covering every (w, h) geometry pins the whole byte path."""
    docs = spark.range(100).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: r["dhash"]
        for r in dhash_bmp(synth_bmp_payloads(docs)).collect()
    }
    assert got == {d: _dhash_closed_form(d) for d in range(100)}


def test_phash_dispositions(spark, sf_dir):
    """Keeper algebra: exact dups point at their class min; canonical rows
    keep themselves; near_dup rows (class reps beaten by a verified near
    class) point strictly below themselves; every keeper <= doc_id."""
    rows = QUERIES["dedup_image_phash"].build(spark, sf_dir).collect()
    assert rows and len({r["doc_id"] for r in rows}) == len(rows)
    by_hash_min = {}
    for r in rows:
        by_hash_min[r["dhash"]] = min(by_hash_min.get(r["dhash"], r["doc_id"]), r["doc_id"])
    statuses = Counter(r["status"] for r in rows)
    assert set(statuses) <= {"exact_dup", "near_dup", "canonical"}
    assert statuses["exact_dup"] > 0  # the 768-period pattern guarantees dups
    for r in rows:
        assert r["keeper_id"] <= r["doc_id"]
        if r["status"] == "exact_dup":
            assert r["doc_id"] != by_hash_min[r["dhash"]]
            assert r["keeper_id"] == by_hash_min[r["dhash"]]
        elif r["status"] == "near_dup":
            assert r["doc_id"] == by_hash_min[r["dhash"]]
            assert r["keeper_id"] < r["doc_id"]
        else:
            assert r["keeper_id"] == r["doc_id"] == by_hash_min[r["dhash"]]


def test_semdedup_reconciles_kmeans_cells(spark, sf_dir):
    """The cell assignment IS kmeans_lloyd_step's (shared _SQL_KM CTE):
    per-cell membership counts must equal its n_assigned exactly."""
    km = {
        r["cluster"]: r["n_assigned"]
        for r in QUERIES["kmeans_lloyd_step"].build(spark, sf_dir).collect()
    }
    sd = Counter(
        r["cell"] for r in QUERIES["semdedup_cells"].build(spark, sf_dir).collect()
    )
    assert dict(sd) == km


def test_semdedup_keeper_rule(spark, sf_dir):
    """is_dup <=> keeper below self; keepers live in the same cell (the
    within-cell contract — cross-cell pairs must never merge)."""
    rows = QUERIES["semdedup_cells"].build(spark, sf_dir).collect()
    assert rows and any(r["is_dup"] for r in rows)
    cell_of = {r["vec_id"]: r["cell"] for r in rows}
    for r in rows:
        assert r["keeper_id"] <= r["vec_id"]
        assert r["is_dup"] == (r["keeper_id"] < r["vec_id"])
        assert cell_of[r["keeper_id"]] == r["cell"]


def test_tombstones_reconcile_state_compaction(spark, sf_dir):
    """Orphans are exactly the dup_of_state docs whose keeper is
    tombstoned, and old_keeper equals that keeper (same verified-min rule,
    same 16/4/4 regime — imported, not re-derived)."""
    sc = {
        r["doc_id"]: r["keeper_id"]
        for r in QUERIES["dedup_state_compaction"].build(spark, sf_dir).collect()
        if r["status"] == "dup_of_state"
    }
    rows = QUERIES["dedup_state_tombstones"].build(spark, sf_dir).collect()
    tomb = [r for r in rows if r["status"] == "tombstoned"]
    orph = [r for r in rows if r["status"] != "tombstoned"]
    assert all(r["doc_id"] % TOMB_MOD == 0 and r["new_keeper"] is None for r in tomb)
    want_orphans = {d: k for d, k in sc.items() if k % TOMB_MOD == 0}
    assert {r["doc_id"]: r["old_keeper"] for r in orph} == want_orphans
    for r in orph:
        assert r["status"] in {"rehomed", "dup_in_delta", "promoted"}
        if r["status"] == "rehomed":
            assert r["new_keeper"] % 2 == 0 and r["new_keeper"] % TOMB_MOD != 0
        elif r["status"] == "dup_in_delta":
            assert r["new_keeper"] % 2 == 1 and r["new_keeper"] < r["doc_id"]
        else:
            assert r["new_keeper"] == r["doc_id"]


def test_tombstones_all_paths_on_fixture(spark, tmp_path):
    """The driver corpus only produces 'promoted' orphans; this handcrafted
    corpus exercises every disposition — and the engine must agree with the
    oracle on it bit-for-bit. Identical texts give identical signatures
    (16/16 agreement), so the match structure is exact by construction:
    - 10 (state, tombstoned) / 12 (state, survivor) / 11 (delta) share a
      text -> 11's min keeper 10 dies, 12 survives -> REHOMED.
    - 20 (state, tombstoned) / 21, 23 (delta) share a text -> both orphan
      with no survivor; 23 has the smaller verified orphan 21 ->
      DUP_IN_DELTA; 21 has none -> PROMOTED.
    - 32 (state) / 33 (delta) share a text; 32 survives -> 33 unaffected,
      absent from the output."""
    con = duckdb.connect()
    docs = [
        (10, "alpha beta gamma delta"),
        (12, "alpha beta gamma delta"),
        (11, "alpha beta gamma delta"),
        (20, "epsilon zeta eta theta"),
        (21, "epsilon zeta eta theta"),
        (23, "epsilon zeta eta theta"),
        (32, "iota kappa lambda mu"),
        (33, "iota kappa lambda mu"),
        (14, "nu xi omicron pi rho"),
        (15, "sigma tau upsilon phi chi"),
    ]
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    fixture = os.path.join(tmp_path, "documents.parquet")
    con.execute(f"COPY d TO '{fixture}' (FORMAT PARQUET)")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{fixture}')")

    spec = QUERIES["dedup_state_tombstones"]
    rows = spec.build(spark, str(tmp_path)).collect()
    got = {r["doc_id"]: (r["status"], r["old_keeper"], r["new_keeper"]) for r in rows}
    assert got == {
        10: ("tombstoned", 10, None),
        20: ("tombstoned", 20, None),
        11: ("rehomed", 10, 12),
        21: ("promoted", 20, 21),
        23: ("dup_in_delta", 20, 21),
    }
    assert_df_equal(spec.build(spark, str(tmp_path)), con, spec.oracle)
