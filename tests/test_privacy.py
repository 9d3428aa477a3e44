"""PII redaction + classifier scoring: value-level invariants beyond the
catalog differential (which pins exact cross-engine equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_mini_projects_spark.operators.privacy import (
    PII_PATTERNS,
    pii_counts_and_redact,
    splice_pii,
)
from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES
from big_data_analytics_mini_projects_spark.sources.tables import load_table


def test_splice_counts_match_construction(spark, sf_dir):
    """The detector must find exactly the tokens the fixture spliced: one
    email iff doc_id%3==0, one phone iff %4==0, one IP iff %5==0, one id
    iff %7==0 (the base corpus is bare lowercase words — no false hits)."""
    rows = QUERIES["pii_redaction"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_email == (1 if r.doc_id % 3 == 0 else 0), r
        assert r.n_phone == (1 if r.doc_id % 4 == 0 else 0), r
        assert r.n_ip == (1 if r.doc_id % 5 == 0 else 0), r
        assert r.n_ssn == (1 if r.doc_id % 7 == 0 else 0), r


def test_redaction_leaves_no_residual_matches(spark, sf_dir):
    """After the chained replaces, every pattern must count zero on the
    redacted text (idempotence / no partial-overlap leftovers)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    red = F.col("pii_text")
    for _, pat, rep in PII_PATTERNS:
        red = F.regexp_replace(red, pat, rep)
    residual = splice_pii(docs).select(
        *[
            F.sum(F.regexp_count(red, F.lit(pat))).alias(name)
            for name, pat, _ in PII_PATTERNS
        ]
    ).collect()[0]
    assert all(v == 0 for v in residual), residual


def test_pii_plan_is_map_only(spark, sf_dir):
    """The redaction stage must be a pure pass over the corpus: no join, no
    aggregate — the only exchange is the deliberate scan spread()."""
    df = QUERIES["pii_redaction"].build(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "simple"
    )
    for bad in ("Join", "HashAggregate", "Sort "):
        assert bad not in plan, plan
    assert plan.count("Exchange") <= 1, plan


def test_classifier_sign_agrees_with_rounded_score(spark, sf_dir):
    """keep == (score > 0) except scores rounding to exactly 0.0, where the
    unrounded sign decides — just pin that both columns are consistent."""
    rows = QUERIES["quality_classifier_score"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.score > 0:
            assert r.keep, r
        elif r.score < 0:
            assert not r.keep, r
