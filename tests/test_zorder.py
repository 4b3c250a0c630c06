"""Z-order clustering (operators/zorder.py): interleave correctness,
and — the point of the layout — footer-stats pruning on BOTH columns,
vs single-column range sort which prunes only its own key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.zorder import (
    column_buckets,
    file_prune_fraction,
    write_zordered,
    zorder_key,
)
from k_means_using_mapreduce_spark.sources.sinks import write_range_sorted

N = 64  # grid side
FILES = 16


@pytest.fixture(scope="module")
def grid(spark):
    # uniform 2-D grid, shuffled row order
    return (
        spark.range(N * N)
        .select(
            (F.col("id") % N).cast("double").alias("x"),
            (F.col("id") / N).cast("long").cast("double").alias("y"),
            F.col("id").alias("payload"),
        )
        .repartition(8)
    )


def test_zorder_key_interleaves(spark):
    # bucket values chosen to occupy exact bit patterns: with 2 bits
    # per col and stats spanning [0, 3], value v maps to bucket v
    df = spark.createDataFrame([(3.0, 0.0), (0.0, 3.0), (3.0, 3.0)], "a double, b double")
    stats = {"a": (0.0, 3.0), "b": (0.0, 3.0)}
    got = [
        r["z"]
        for r in df.select(zorder_key(stats, bits_per_col=2).alias("z")).collect()
    ]
    # a=3 (11b) interleaves to bits 0,2 -> 5; b=3 to bits 1,3 -> 10
    assert got == [5, 10, 15]


def test_bucket_stats_and_validation(grid):
    stats = column_buckets(grid, ["x", "y"])
    assert stats["x"] == (0.0, float(N - 1))
    assert stats["y"] == (0.0, float(N - 1))
    with pytest.raises(ValueError):
        zorder_key({"x": (0.0, 1.0)})  # one column
    with pytest.raises(ValueError):
        zorder_key({c: (0.0, 1.0) for c in "abcdefg"}, bits_per_col=12)


def test_zorder_prunes_both_dims(grid, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("layout"))
    zpath, xpath = f"{base}/z", f"{base}/x"
    write_zordered(grid, zpath, ["x", "y"], bits_per_col=6, n_files=FILES)
    write_range_sorted(grid, xpath, ("x",), n_files=FILES)
    spark = grid.sparkSession

    band = (10.0, 13.0)  # ~6% of the domain
    # x-sorted layout: prunes x, cannot prune y
    assert file_prune_fraction(spark, xpath, "x", *band) <= 0.25
    assert file_prune_fraction(spark, xpath, "y", *band) == 1.0
    # z-ordered layout: prunes BOTH dimensions
    zx = file_prune_fraction(spark, zpath, "x", *band)
    zy = file_prune_fraction(spark, zpath, "y", *band)
    assert zx <= 0.5, zx
    assert zy <= 0.5, zy


def test_zordered_write_round_trips(grid, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rt")) + "/t"
    write_zordered(grid, path, ["x", "y"], n_files=4)
    spark = grid.sparkSession
    back = spark.read.parquet(path)
    assert back.count() == N * N
    assert set(back.columns) == {"x", "y", "payload"}  # _zkey dropped
    assert back.agg(F.sum("payload")).first()[0] == (N * N - 1) * N * N // 2


def test_quantile_buckets_handle_skew(spark, tmp_path_factory):
    # x uniform, y power-law-ish: linear buckets put ~all y mass in
    # one cell; quantile buckets restore pruning on y
    df = spark.range(4096).select(
        (F.col("id") % 64).cast("double").alias("x"),
        F.pow(F.lit(1.2), (F.col("id") / 64).cast("long") % 40).alias("y"),
        F.col("id").alias("payload"),
    )
    base = str(tmp_path_factory.mktemp("skew"))
    lin, qnt = f"{base}/lin", f"{base}/qnt"
    write_zordered(df, lin, ["x", "y"], bits_per_col=6, n_files=16)
    write_zordered(
        df, qnt, ["x", "y"], bits_per_col=6, n_files=16, method="quantile"
    )
    # a band covering the low-magnitude half of y's mass
    med = df.agg(F.expr("percentile(y, 0.5)")).first()[0]
    frac_lin = file_prune_fraction(spark, lin, "y", 0.0, med * 0.5)
    frac_qnt = file_prune_fraction(spark, qnt, "y", 0.0, med * 0.5)
    assert frac_qnt < frac_lin
    assert frac_qnt <= 0.75


def test_constant_column_collapses(spark, tmp_path_factory):
    df = spark.range(100).select(
        F.lit(7.0).alias("c"), F.col("id").cast("double").alias("v")
    )
    path = str(tmp_path_factory.mktemp("const")) + "/t"
    # constant column -> bucket 0 everywhere; must not error
    write_zordered(df, path, ["c", "v"], n_files=2)
    assert spark.read.parquet(path).count() == 100
