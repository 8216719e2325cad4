"""DuckDB-differential tests for the relational core (SURVEY B2-B8)."""

from __future__ import annotations

import pytest

from hadoop_web_browsing_logs_spark.plans.registry import all_queries

from .conftest import assert_query_matches_oracle

RELATIONAL_CATEGORIES = {"projection", "join", "aggregation", "window", "sort", "setop", "scalar"}


def _oracle_query_names():
    return sorted(
        n for n, q in all_queries().items() if q.oracle is not None and q.category in RELATIONAL_CATEGORIES
    )


@pytest.mark.parametrize("name", _oracle_query_names())
def test_matches_duckdb_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_approx_count_distinct_within_bounds(spark):
    from hadoop_web_browsing_logs_spark.plans.registry import get_query
    from .conftest import SF_DIR

    rows = get_query("q_agg_approx_distinct").fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # HLL++ default rsd = 5%; allow generous 15% envelope on small groups
        assert abs(r.approx_orders - r.exact_orders) <= max(5, 0.15 * r.exact_orders)
