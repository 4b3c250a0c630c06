"""operators/entity.py: blocking semantics, distance filter, hot-block
cap, plan shape (equi-join on block keys, no cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


# ------------------------------------------------------- Fellegi-Sunter


def test_fs_score_pairs_weights_and_decisions(spark):
    import math

    from k_means_using_mapreduce_spark.operators.entity import fs_score_pairs

    pairs = spark.createDataFrame(
        [(1, 2, "x", "x"), (3, 4, "x", "y")],
        "id_a long, id_b long, va string, vb string",
    )
    m, u = {"v": 0.9}, {"v": 0.1}
    out = fs_score_pairs(
        pairs,
        {"v": F.col("va") == F.col("vb")},
        m,
        u,
        upper=1.0,
        lower=-1.0,
    ).collect()
    by = {r["id_a"]: r for r in out}
    assert by[1]["agree_v"] == 1
    assert by[1]["weight"] == pytest.approx(math.log2(9.0))
    assert by[1]["decision"] == "match"
    assert by[3]["agree_v"] == 0
    assert by[3]["weight"] == pytest.approx(math.log2(0.1 / 0.9))
    assert by[3]["decision"] == "non_match"


def test_fs_score_pairs_null_agreement_is_disagreement(spark):
    from k_means_using_mapreduce_spark.operators.entity import fs_score_pairs

    pairs = spark.createDataFrame(
        [(1, 2, None, "x")], "id_a long, id_b long, va string, vb string"
    )
    out = fs_score_pairs(
        pairs, {"v": F.col("va") == F.col("vb")},
        {"v": 0.9}, {"v": 0.1}, upper=1.0, lower=-1.0,
    ).collect()[0]
    assert out["agree_v"] == 0


def test_fs_score_pairs_rejects_bad_mu(spark):
    from k_means_using_mapreduce_spark.operators.entity import fs_score_pairs

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fs_score_pairs(
            pairs, {"v": F.lit(True)}, {"v": 0.1}, {"v": 0.9},
            upper=1.0, lower=-1.0,
        )


def test_fs_u_probabilities_collision_law(spark):
    from k_means_using_mapreduce_spark.operators.entity import (
        fs_u_probabilities,
    )

    # 4 values of a: 2+1+1 of 4 -> u = (2/4)^2+(1/4)^2+(1/4)^2 = 0.375
    # b constant -> u = 1.0
    df = spark.createDataFrame(
        [("x", "c"), ("x", "c"), ("y", "c"), ("z", "c")],
        "a string, b string",
    )
    got = {r["field"]: r["u"] for r in fs_u_probabilities(df, ["a", "b"]).collect()}
    assert got["a"] == pytest.approx(0.375)
    assert got["b"] == pytest.approx(1.0)


def test_fs_em_separates_planted_duplicates(spark):
    """EM on unlabeled pairs recovers m >> u and a sane prevalence when
    20% of pairs are planted near-duplicates agreeing on most fields."""
    import random

    from k_means_using_mapreduce_spark.operators.entity import fs_em

    rng = random.Random(7)
    rows = []
    for i in range(400):
        if i % 5 == 0:  # true match: agree on ~95% of fields
            g = [int(rng.random() < 0.95) for _ in range(3)]
        else:  # non-match: agree at background rates
            g = [int(rng.random() < 0.15) for _ in range(3)]
        rows.append((i, *g))
    df = spark.createDataFrame(
        rows, "pair_id long, agree_f1 int, agree_f2 int, agree_f3 int"
    )
    est = fs_em(df, ["f1", "f2", "f3"], iters=15)
    for f in ["f1", "f2", "f3"]:
        assert est["m"][f] > 0.7
        assert est["u"][f] < 0.3
        assert est["m"][f] > est["u"][f]
    assert 0.1 < est["p"] < 0.35
