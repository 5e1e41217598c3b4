"""Differential tests: every registered query vs its DuckDB oracle
(SURVEY.md §5.2(3)) — a local replay of the driver's t2 gate."""

from __future__ import annotations

import pytest

from rdbms_metadata_manager_spark.registry import all_oracles, all_queries

from conftest import assert_matches_oracle

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, _ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
