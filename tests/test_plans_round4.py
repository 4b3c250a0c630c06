"""Plan-shape assertions for the round-4 session-5 families: the
scale claims in their docstrings, pinned against regression."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark import contracts
from k_means_using_mapreduce_spark.plans import (
    broadcast_join_count,
    exchange_count,
    executed_plan,
    read_schemas,
    sort_merge_join_count,
)


@pytest.fixture(scope="module")
def sf(sf_oracle):
    return sf_oracle


def _q(name, spark, sf):
    return contracts.QUERIES[name](spark, sf)


def test_grouped_ols_single_exchange_and_pruned_scan(spark, sf):
    df = _q("ols_price_trend_by_returnflag", spark, sf)
    # one shuffle: the groupBy on the grouping key; sums are partial.
    assert exchange_count(df) == 1
    (cols,) = read_schemas(df)
    assert set(cols) <= {"l_returnflag", "l_quantity", "l_extendedprice"}


def test_declarative_ridge_no_join_no_cartesian(spark, sf):
    df = _q("ridge_price_model_lineitem", spark, sf)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert sort_merge_join_count(df) == 0
    # global 1-row aggregate: single exchange for the final reduce.
    assert exchange_count(df) == 1


def test_attribution_no_cartesian_single_user_join(spark, sf):
    df = _q("attribution_report_events", spark, sf)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan


def test_causal_ipw_no_join_at_all(spark, sf):
    df = _q("discount_quantity_ipw", spark, sf)
    plan = executed_plan(df)
    # aggregates-of-aggregates: no join operator anywhere.
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_ivm_single_shuffle_merge(spark, sf):
    df = _q("ivm_priority_revenue", spark, sf)
    plan = executed_plan(df)
    assert "Join" not in plan  # union + re-group, never a join
    # exchanges: base agg + delta agg + merge re-group (3 groupBys);
    # must not grow beyond that.
    assert exchange_count(df) <= 3


def test_fdr_screen_broadcasts_the_global_row(spark, sf):
    df = _q("mean_shift_fdr_documents", spark, sf)
    plan = executed_plan(df)
    # the 1-row global-stats side rides a broadcast nested-loop cross
    # (the right plan for a single-row build side), never a shuffle join
    assert "BroadcastNestedLoopJoin" in plan
    assert sort_merge_join_count(df) == 0


def test_growth_accounting_no_dense_grid_no_cartesian(spark, sf):
    df = _q("growth_accounting_events", spark, sf)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    # the horizon guard is a 1-row broadcast nested-loop, and the only
    # shuffle join is the designed (u, b) full-outer self-shift
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("SortMergeJoin") <= 1


def test_forecast_and_seasonal_scan_events_once(spark, sf):
    for name in ("forecast_backtest_events", "seasonal_strength_events"):
        df = _q(name, spark, sf)
        # events parquet appears in the plan exactly twice: counts +
        # bounds/keys for the grid (resample_counts reads bounds and
        # distinct keys from the same relation).
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan


def test_hashed_features_pruned_scan(spark, sf):
    df = _q("hashed_features_profile_documents", spark, sf)
    (cols,) = read_schemas(df)
    assert set(cols) <= {"doc_id", "text"}
