"""Salted aggregation/join equivalence on skewed data + SQL catalog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)
from k_means_using_mapreduce_spark.sources.catalog import register_tables


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows on one hot key
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("cold"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.union(cold).cache()


def test_salted_aggregate_equals_direct(skewed):
    direct = {
        r["k"]: (r["n"], r["sum_v"])
        for r in skewed.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["sum_v"])
        for r in salted_aggregate(skewed, ["k"], sums=["v"], buckets=16).collect()
    }
    assert salted.keys() == direct.keys()
    for k in direct:
        assert salted[k][0] == direct[k][0]
        assert salted[k][1] == pytest.approx(direct[k][1])


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(50)],
        "k string, label string",
    )
    plain = skewed.join(dim, "k").groupBy("label").count()
    salted = salted_broadcast_left(skewed, dim, "k", buckets=8).groupBy("label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_register_tables_sql(spark, sf_small):
    names = register_tables(spark, sf_small)
    assert "lineitem" in names and len(names) == 10
    out = spark.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag"
    ).collect()
    assert sum(r["n"] for r in out) == spark.table("lineitem").count()
    joined = spark.sql(
        """SELECT r_name, count(*) AS n FROM region
           JOIN nation ON n_regionkey = r_regionkey GROUP BY r_name"""
    )
    assert joined.count() == 5


def test_salted_aggregate_requires_an_aggregate(skewed):
    import pytest

    with pytest.raises(ValueError, match="counts=True or at least one"):
        salted_aggregate(skewed, ["k"], sums=(), counts=False)


def test_heavy_keys_and_report_consistency(spark):
    """heavy_keys' top-1 must agree with skew_report's max/top1_share,
    and a uniform key distribution must recommend 1 bucket."""
    from k_means_using_mapreduce_spark.operators.skew import (
        heavy_keys,
        skew_report,
    )
    import pyspark.sql.functions as F

    rows = [("hot",)] * 60 + [(f"k{i}",) for i in range(20) for _ in range(3)]
    df = spark.createDataFrame(rows, "k string")
    top = heavy_keys(df, ["k"], top=3).collect()
    assert top[0]["k"] == "hot" and top[0]["n"] == 60
    assert top[0]["share"] == pytest.approx(60 / 120)
    rep = skew_report(df, ["k"]).first()
    assert rep["max_key_n"] == 60 and rep["n_keys"] == 21
    assert rep["skew_factor"] == pytest.approx(20.0)  # 60 / p50(=3)
    assert rep["recommended_buckets"] == 20
    uniform = spark.createDataFrame([(f"u{i}",) for i in range(8)] * 4, "k string")
    assert skew_report(uniform, ["k"]).first()["recommended_buckets"] == 1
    with pytest.raises(ValueError, match="key_cols"):
        skew_report(df, [])
    with pytest.raises(ValueError, match="top"):
        heavy_keys(df, ["k"], top=0)


def test_join_plan_advice_branches(spark):
    from k_means_using_mapreduce_spark.operators.skew import join_plan_advice

    fact = spark.createDataFrame(
        [("hot",)] * 40 + [(f"k{i}",) for i in range(10)], "k string"
    )
    small_dim = spark.createDataFrame([(x,) for x in ["hot", "k1"]], "k string")
    big_dim = spark.createDataFrame([(f"d{i}",) for i in range(50)], "k string")

    r = join_plan_advice(fact, small_dim, "k", "k", broadcast_row_limit=10).first()
    assert r["strategy"] == "broadcast" and r["salt_buckets"] == 0

    r = join_plan_advice(
        fact, big_dim, "k", "k", broadcast_row_limit=10, skew_threshold=8.0
    ).first()
    assert r["strategy"] == "salted_shuffle"
    assert r["salt_buckets"] == 40  # ceil(40 / p50(=1))

    uniform = spark.createDataFrame([(f"u{i}",) for i in range(30)] * 2, "k string")
    r = join_plan_advice(
        uniform, big_dim, "k", "k", broadcast_row_limit=10
    ).first()
    assert r["strategy"] == "shuffle" and r["salt_buckets"] == 0

    with pytest.raises(ValueError, match="skew_threshold"):
        join_plan_advice(fact, big_dim, "k", "k", skew_threshold=1.0)
