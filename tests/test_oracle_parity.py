"""The primary correctness gate, run locally at sf0.001.

Mirrors the external driver: every declared query executes on Spark AND its
oracle SQL executes on DuckDB; row counts, column names and canonicalized
values must match exactly (SURVEY.md §5.2 rule: never declare a query whose
hash hasn't matched locally).
"""

from __future__ import annotations

import pytest

from mrs_mapreduce_spark.oracle import check_queries
from mrs_mapreduce_spark.registry import load_all

_NAMES = sorted(load_all())


@pytest.fixture(scope="module")
def all_results(spark, sf_dir):
    results = check_queries(spark, sf_dir)
    return {r.name: r for r in results}


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(all_results, name):
    result = all_results[name]
    assert result.ok, str(result)
