"""Approximate-aggregate (sketch) coverage: HLL distinct counts and
approximate percentiles. Not oracle-portable (Spark's HLL++/KLL
sketches differ from DuckDB's implementations), so correctness is
pinned against the exact aggregates within the documented error bound
— the right contract for the 100 TB path where exact distinct/quantile
is a full shuffle but a sketch is a map-side merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.sources.loaders import load_table


@pytest.fixture(scope="module")
def events(spark, sf_oracle):
    df = load_table(spark, sf_oracle, "events").cache()
    yield df
    # a lingering cached relation would defeat column pruning in other
    # modules' plan assertions (Spark substitutes the InMemoryRelation
    # into any later plan over the same table)
    df.unpersist()


def test_hll_distinct_users_within_rsd(events):
    row = events.select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_hll_grouped_within_rsd(events):
    rows = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / max(r["exact"], 1) < 0.1


def test_approx_percentile_close_to_exact(spark, sf_oracle):
    cust = load_table(spark, sf_oracle, "customer")
    row = cust.select(
        F.percentile_approx("c_acctbal", [0.5, 0.95], 10_000).alias("approx"),
        F.expr("percentile(c_acctbal, array(0.5, 0.95))").alias("exact"),
    ).collect()[0]
    spread = (
        cust.select(F.max("c_acctbal") - F.min("c_acctbal")).collect()[0][0]
    )
    for a, e in zip(row["approx"], row["exact"]):
        assert abs(a - e) / spread < 0.01


def test_hll_is_single_aggregate_no_expand(events):
    """The scale property that motivates sketches: approx distinct is
    one partial+final aggregate (mergeable state), where exact
    distinct needs Expand or a two-phase distinct shuffle."""
    from k_means_using_mapreduce_spark.plans.explain import (
        exchange_count,
        executed_plan,
    )

    approx = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("u")
    )
    assert exchange_count(approx) == 1
    assert "Expand" not in executed_plan(approx)
    exact = events.groupBy("event_type").agg(F.countDistinct("user_id"))
    assert exchange_count(exact) >= 1  # exact pays at least as much
