"""operators/entity.py: blocking semantics, distance filter, hot-block
cap, plan shape (equi-join on block keys, no cartesian)."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark.operators.entity import (
    blocked_match_candidates,
)
from k_means_using_mapreduce_spark.plans.explain import executed_plan


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        (1, "acme corp", "US", "A"),
        (2, "acme corp.", "US", "A"),   # d=1: candidate
        (3, "acme corp", "DE", "A"),    # identical name, other block
        (4, "zenith ltd", "US", "A"),   # same block, far name
        (5, "acme corpse", "US", "A"),  # d=2 from #1: candidate
    ]
    return spark.createDataFrame(rows, "id long, name string, country string, seg string")


def test_blocking_and_distance(records):
    out = blocked_match_candidates(
        records, id_col="id", name_col="name",
        block_cols=["country", "seg"], max_distance=2,
    )
    got = sorted((r["id_a"], r["id_b"], r["distance"]) for r in out.collect())
    assert got == [(1, 2, 1), (1, 5, 2), (2, 5, 2)]  # 3 never pairs cross-block


def test_hot_block_cap(records):
    out = blocked_match_candidates(
        records, id_col="id", name_col="name",
        block_cols=["country", "seg"], max_distance=2, max_block_size=3,
    )
    assert out.count() == 0  # the 4-member US/A block is excluded


def test_validation(records):
    with pytest.raises(ValueError):
        blocked_match_candidates(records, id_col="id", name_col="name", block_cols=[])
    with pytest.raises(ValueError):
        blocked_match_candidates(
            records, id_col="id", name_col="name",
            block_cols=["seg"], max_distance=-1,
        )
    with pytest.raises(ValueError):
        blocked_match_candidates(
            records, id_col="id", name_col="name",
            block_cols=["seg"], max_block_size=1,
        )


def test_no_cartesian_in_plan(spark, sf_oracle):
    cust = spark.read.parquet(f"{sf_oracle}/customer.parquet")
    out = blocked_match_candidates(
        cust, id_col="c_custkey", name_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"], max_distance=2,
    )
    out.collect()
    assert "Cartesian" not in executed_plan(out)


def test_sorted_neighborhood_closed_form(spark):
    from k_means_using_mapreduce_spark.operators.entity import (
        sorted_neighborhood_candidates,
    )
    import pytest as _pt
    from pyspark.sql import functions as SF

    # sort by name: order is (anna, annna, bob, bobby, zed) by (name, id)
    rows = [
        (1, "bob"), (2, "anna"), (3, "bobby"), (4, "annna"), (5, "zed"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["rank_gap"]
        for r in sorted_neighborhood_candidates(
            df, SF.col("name"), window=2
        ).collect()
    }
    # n*window - edge truncation: 4 gap-1 pairs + 3 gap-2 pairs
    assert len(got) == 7
    assert got[(2, 4)] == 1      # anna-annna adjacent
    assert got[(1, 3)] == 1      # bob-bobby adjacent
    assert got[(1, 2)] == 2  # anna(rk1) -> bob(rk3), canonicalized
    # canonical ordering: id_a < id_b always
    assert all(a < b for a, b in got)
    with _pt.raises(ValueError, match="window"):
        sorted_neighborhood_candidates(df, SF.col("name"), window=0)
