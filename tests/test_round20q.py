"""Unit tests for the round-11 fresh batch part 2 (two-level SemDeDup
assignment, audio average-hash audit, cascading tombstone curve). Full
differential runs in test_catalog_oracle; here: the local driver-gate
mirror, the structural two-level/flat agreement theorem, the one-parse
two-fingerprint kernel contract, and a handcrafted corpus exercising the
CASCADING re-home that the one-shot tombstone fold cannot produce."""

from __future__ import annotations

import os

import duckdb

from big_data_analytics_mini_projects_spark.operators.audiofp import afp_wav, afps_wav
from big_data_analytics_mini_projects_spark.operators.multimodal import (
    synth_wav_payloads,
)
from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES

from .compare import assert_df_equal

R20 = ("semdedup_two_level", "dedup_audio_ahash", "dedup_tombstone_curve")


def test_round20q_differential(spark, duck, sf_dir):
    """Local mirror of the driver gate for all three."""
    for name in R20:
        spec = QUERIES[name]
        assert_df_equal(spec.build(spark, sf_dir), duck, spec.oracle)


def test_two_level_agreement_theorem(spark, sf_dir):
    """Structural invariants of the hierarchical assignment: (a) a fine
    seed's own coarse assignment IS its f2c row (same argmin formula), so
    the output self-describes the fine->coarse map; (b) cell_two always
    lies in the vector's coarse cell; (c) agree <=> the FLAT argmin lies
    in the vector's coarse cell — disagreements are exactly the
    coarse-boundary effect, never an error inside a coarse region (subset
    argmin equals global argmin whenever the subset contains it)."""
    out = QUERIES["semdedup_two_level"].build(spark, sf_dir).toPandas()
    f2c = dict(
        zip(out.loc[out["vec_id"] < 64, "vec_id"], out.loc[out["vec_id"] < 64, "coarse"])
    )
    assert len(f2c) == 64
    for r in out.itertuples():
        assert f2c[r.cell_two] == r.coarse
        assert r.agree == (f2c[r.cell_flat] == r.coarse)
        assert r.agree == (r.cell_two == r.cell_flat)
    # the corpus exercises the boundary effect (some disagreement) while
    # the two-level path still recovers the flat argmin for a solid share
    assert 0 < out["agree"].sum() < len(out)


def test_afps_kernel_contract(spark):
    """One parse, two fingerprints: the combined kernel's afp column must
    be bit-identical to the single-fingerprint kernel's, and both hashes
    stay exact in a signed BIGINT (60-bit contract)."""
    ids = [0, 3, 17, 123, 499]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    payloads = synth_wav_payloads(docs)
    single = {r["doc_id"]: r["afp"] for r in afp_wav(payloads).collect()}
    both = {r["doc_id"]: (r["afp"], r["aafp"]) for r in afps_wav(payloads).collect()}
    assert {d: v[0] for d, v in both.items()} == single
    assert all(0 <= v < (1 << 60) for pair in both.values() for v in pair)


def test_audio_ahash_audit_discriminates(spark, sf_dir):
    """The agreement audit must be a real signal on the driver corpus:
    both flag values occur, and agreement holds exactly when the two
    families' exact-class keepers coincide (recomputed independently from
    the fingerprint columns)."""
    out = QUERIES["dedup_audio_ahash"].build(spark, sf_dir).toPandas()
    base = QUERIES["dedup_audio_fp"].build(spark, sf_dir).toPandas()
    dk = dict(zip(base["afp"], base.groupby("afp")["doc_id"].transform("min")))
    doc_dk = dict(zip(base["doc_id"], base["afp"].map(dk)))
    ak = out.groupby("aafp")["doc_id"].min()
    for r in out.itertuples():
        assert r.keeper_id == ak[r.aafp]
        assert r.agree == (r.keeper_id == doc_dk[r.doc_id])
    assert 0 < out["agree"].sum() < len(out)


def test_tombstone_curve_conservation(spark, sf_dir):
    """Ledger arithmetic on the driver corpus: per step, orphans split
    exactly into the three dispositions; the tombstone totals cover the
    whole takedown ledger; the running state size folds exactly."""
    out = (
        QUERIES["dedup_tombstone_curve"].build(spark, sf_dir)
        .orderBy("step")
        .toPandas()
    )
    assert list(out["step"]) == [0, 1, 2]
    assert (
        out["n_orphans"] == out["n_rehomed"] + out["n_dup_in_delta"] + out["n_promoted"]
    ).all()
    batch = QUERIES["dedup_state_tombstones"].build(spark, sf_dir).toPandas()
    assert out["n_tombstoned"].sum() == (batch["status"] == "tombstoned").sum()
    # un-folding the running state size must give the same state_before
    # at every step (the fold is exact)
    bases = {
        r.state_size
        + out.loc[: r.Index, "n_tombstoned"].sum()
        - out.loc[: r.Index, "n_promoted"].sum()
        for r in out.itertuples()
    }
    assert len(bases) == 1


def test_tombstone_curve_cascade_on_fixture(spark, tmp_path):
    """Handcrafted corpus exercising what the one-shot fold cannot: a doc
    re-homed by batch 0 whose NEW keeper dies in batch 1 (the cascade),
    plus later-batch dup_in_delta/promoted exits — engine vs oracle
    bit-for-bit, and the per-step rows checked by hand.

    Identical texts give 16/16 signature agreement, so the match
    structure is exact by construction. Batch of tombstone s is
    (s // 10) % 3: 30,60 -> batch 0; 40,70 -> batch 1; 50,80 -> batch 2.
    - text A: states 30, 40, 52 + delta 11. Keeper chain for 11:
      30 (dies b0) -> rehomed to 40 (dies b1) -> rehomed to 52 (safe).
    - text B: state 60 + deltas 21, 23. Both orphan at b0 with no
      survivor; 23 has verified smaller orphan 21 -> dup_in_delta,
      21 -> promoted.
    - text C: state 70 + delta 31 -> orphan at b1, promoted.
    - text E: states 50, 80 + delta 41: keeper 50 dies b2, 80 dies b2
      too -> no survivor -> promoted at b2.
    - text D: state 32 + delta 33 -> untouched filler."""
    con = duckdb.connect()
    docs = [
        (30, "alpha beta gamma delta"),
        (40, "alpha beta gamma delta"),
        (52, "alpha beta gamma delta"),
        (11, "alpha beta gamma delta"),
        (60, "epsilon zeta eta theta"),
        (21, "epsilon zeta eta theta"),
        (23, "epsilon zeta eta theta"),
        (70, "iota kappa lambda mu"),
        (31, "iota kappa lambda mu"),
        (50, "nu xi omicron pi"),
        (80, "nu xi omicron pi"),
        (41, "nu xi omicron pi"),
        (32, "rho sigma tau upsilon"),
        (33, "rho sigma tau upsilon"),
        (14, "phi chi psi omega"),
    ]
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    fixture = os.path.join(tmp_path, "documents.parquet")
    con.execute(f"COPY d TO '{fixture}' (FORMAT PARQUET)")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{fixture}')")

    spec = QUERIES["dedup_tombstone_curve"]
    rows = {
        r["step"]: r
        for r in spec.build(spark, str(tmp_path)).collect()
    }
    # state canonicals (even): 30,40,52,60,70,50,80,32,14 -> 9
    assert (
        rows[0]["n_tombstoned"], rows[0]["n_orphans"], rows[0]["n_rehomed"],
        rows[0]["n_dup_in_delta"], rows[0]["n_promoted"], rows[0]["state_size"],
    ) == (2, 3, 1, 1, 1, 8)
    assert (
        rows[1]["n_tombstoned"], rows[1]["n_orphans"], rows[1]["n_rehomed"],
        rows[1]["n_dup_in_delta"], rows[1]["n_promoted"], rows[1]["state_size"],
    ) == (2, 2, 1, 0, 1, 7)
    assert (
        rows[2]["n_tombstoned"], rows[2]["n_orphans"], rows[2]["n_rehomed"],
        rows[2]["n_dup_in_delta"], rows[2]["n_promoted"], rows[2]["state_size"],
    ) == (2, 1, 0, 0, 1, 6)
    assert_df_equal(spec.build(spark, str(tmp_path)), con, spec.oracle)
