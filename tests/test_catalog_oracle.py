"""Differential test for every catalog query that declares a DuckDB oracle —
the local mirror of the driver's CORRECTNESS gate (run at sf0.001 here,
sf0.01 by the driver)."""

from __future__ import annotations

import pytest

from big_data_analytics_mini_projects_spark.plans.catalog import QUERIES

from .compare import assert_df_equal

CASES = [name for name, spec in QUERIES.items() if spec.oracle is not None]


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = QUERIES[name]
    assert_df_equal(spec.build(spark, sf_dir), duck, spec.oracle)


def test_every_query_named_and_documented():
    for name, spec in QUERIES.items():
        assert spec.doc, f"{name} lacks a doc"
