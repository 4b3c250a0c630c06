"""Physical-plan property assertions — the engine's scale contract.

Each assertion encodes a property that, if regressed, multiplies cost
at 100 TB: pushdown reaching the scan, column pruning, dimension
broadcasting, map-side partial aggregation, and shuffle-free narrow
operators."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark import contracts
from k_means_using_mapreduce_spark.plans import (
    broadcast_join_count,
    exchange_count,
    pushed_filters,
    read_schemas,
    sort_merge_join_count,
)


@pytest.fixture(scope="module")
def sf(sf_oracle):
    return sf_oracle


def _q(name, spark, sf):
    return contracts.QUERIES[name](spark, sf)


def test_q1_filter_pushed_to_scan(spark, sf):
    df = _q("q1_pricing_summary", spark, sf)
    filters = " ".join(pushed_filters(df))
    assert "l_shipdate" in filters


def test_q1_column_pruning(spark, sf):
    df = _q("q1_pricing_summary", spark, sf)
    (cols,) = read_schemas(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert {"l_quantity", "l_extendedprice", "l_discount", "l_tax"} <= set(cols)


def test_q3_broadcasts_dims_no_sort_merge(spark, sf):
    df = _q("q3_top_orders", spark, sf)
    assert broadcast_join_count(df) == 2
    assert sort_merge_join_count(df) == 0


def test_nation_revenue_all_dims_broadcast(spark, sf):
    df = _q("nation_revenue", spark, sf)
    assert broadcast_join_count(df) == 4
    assert sort_merge_join_count(df) == 0


def test_assign_is_shuffle_free(spark, sf):
    df = _q("kmeans_assign_events", spark, sf)
    assert exchange_count(df) == 0


def test_assign_prunes_unused_columns(spark, sf):
    df = _q("kmeans_assign_events", spark, sf)
    (cols,) = read_schemas(df)
    assert "props" not in cols and "event_type" not in cols


def test_update_single_shuffle_with_partial_agg(spark, sf):
    df = _q("kmeans_update_embeddings", spark, sf)
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    plan = executed_plan(df)
    assert exchange_count(df) == 1
    assert plan.count("HashAggregate") == 2  # partial + final


def test_topk_uses_take_ordered(spark, sf):
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("ann_topk_embeddings", spark, sf)
    assert "TakeOrderedAndProject" in executed_plan(df)


def test_knn_join_broadcasts_queries(spark, sf):
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("knn_join_embeddings", spark, sf)
    assert "BroadcastNestedLoopJoin" in executed_plan(df)


def test_dedup_exact_shuffles_hash_not_text(spark, sf):
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    df = _q("dedup_exact_documents", spark, sf)
    plan = executed_plan(df)
    # the exchange partitions on the sha2 hash column, not raw text
    ex = plan[plan.index("Exchange hashpartitioning"):]
    assert "_h" in ex.split("\n")[0]
