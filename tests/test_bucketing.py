"""Bucketed-table layout: co-located joins and aggregations without
exchanges — the storage-level scale lever (see SCALE.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.plans.explain import (
    exchange_count,
    executed_plan,
)
from k_means_using_mapreduce_spark.sources.loaders import load_table
from k_means_using_mapreduce_spark.sources.sinks import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    write_bucketed_table(orders, "b_orders", "o_orderkey", 8,
                         sort_cols=("o_orderkey",))
    write_bucketed_table(li, "b_lineitem", "l_orderkey", 8,
                         sort_cols=("l_orderkey",))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-join planning: sf0.001 tables are tiny enough to
    broadcast, which would bypass (and 'disable') bucketed scans."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_no_exchange_no_sort(spark, bucketed, no_broadcast):
    a = spark.table("b_orders")
    b = spark.table("b_lineitem")
    j = a.join(b, a.o_orderkey == b.l_orderkey).select("o_orderkey", "l_quantity")
    plan = executed_plan(j)
    assert "SortMergeJoin" in plan
    assert exchange_count(j) == 0  # both sides pre-bucketed on the key
    # Note: in-bucket Sort nodes remain — Spark ≥3.0 ignores sortBy
    # metadata on read unless legacy.bucketedTableScan.outputOrdering
    # is set (SPARK-28124). The shuffle (the scale cost) is what the
    # bucketing removes; the residual sort is partition-local.
    n = j.count()
    # same result as the unbucketed join
    o2 = load_table(spark, "/root/testdata/sf0.001", "orders")
    l2 = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    assert n == o2.join(l2, o2.o_orderkey == l2.l_orderkey).count()


def test_bucketed_aggregation_no_exchange(spark, bucketed):
    b = spark.table("b_lineitem")
    agg = b.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    assert exchange_count(agg) == 0


def test_partitioned_write_prunes_partitions(spark, sf_small, tmp_path):
    """partitionBy layout → reads with a partition predicate scan only
    the matching directories (PartitionFilters, zero data filters)."""
    ev = load_table(spark, sf_small, "events").select("event_id", "event_type")
    path = str(tmp_path / "ev_parted")
    ev.write.partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).where(F.col("event_type") == "click")
    plan = executed_plan(back)
    assert "PartitionFilters: [" in plan
    # the predicate is satisfied entirely by pruning — no row-level filter
    assert "PushedFilters: []" in plan
    n_click = back.count()
    assert n_click == ev.where("event_type = 'click'").count()


def test_write_range_sorted_files_cover_disjoint_ranges(spark, tmp_path):
    """Each output file's [min, max] key range is disjoint from every
    other's — the property that makes parquet min/max stats prune
    range predicates at read time."""
    import glob

    from k_means_using_mapreduce_spark.sources.sinks import write_range_sorted

    df = spark.range(10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k"), F.col("id").alias("v")
    )
    path = str(tmp_path / "ranged")
    write_range_sorted(df, path, ("k",), n_files=8)

    ranges = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        part = spark.read.parquet(f).agg(
            F.min("k").alias("lo"), F.max("k").alias("hi"), F.count("*").alias("n")
        ).collect()[0]
        if part["n"]:
            ranges.append((part["lo"], part["hi"]))
    assert len(ranges) >= 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint, ordered

    # and the whole dataset round-trips
    assert spark.read.parquet(path).count() == 10_000


def test_write_range_sorted_validates_cols(spark, tmp_path):
    from k_means_using_mapreduce_spark.sources.sinks import write_range_sorted

    with pytest.raises(ValueError):
        write_range_sorted(spark.range(5), str(tmp_path / "x"), ())


def test_compact_parquet_reduces_files(spark, tmp_path):
    import glob

    import pytest as _pytest

    from k_means_using_mapreduce_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)  # 40 tiny files
    before = len(glob.glob(f"{path}/part-*.parquet"))
    assert before == 40
    n = compact_parquet(spark, path, target_mb=128, sort_within_by=["id"])
    after = glob.glob(f"{path}/part-*.parquet")
    assert len(after) == n == 1
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg(F.sum("v")).first()[0] == 2 * sum(range(10000))
    assert not glob.glob(f"{path}_compact_tmp*") and not glob.glob(f"{path}_compact_old*")
    with _pytest.raises(ValueError):
        compact_parquet(spark, str(tmp_path / "missing"))


def test_merge_upsert_parquet(spark, tmp_path):
    from k_means_using_mapreduce_spark.sources.sinks import merge_upsert_parquet

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "id long, v long, payload string"
    )
    merge_upsert_parquet(spark, path, base, key_cols=["id"], order_cols=["v"])
    upd = spark.createDataFrame(
        [(2, 20, "b2"),   # newer version of id 2 wins
         (3, 5, "c"),     # brand-new key inserted
         (1, 5, "stale")],  # OLDER than current id 1 -> ignored
        "id long, v long, payload string",
    )
    merge_upsert_parquet(spark, path, upd, key_cols=["id"], order_cols=["v"])
    got = {r["id"]: (r["v"], r["payload"])
           for r in spark.read.parquet(path).collect()}
    assert got == {1: (10, "a"), 2: (20, "b2"), 3: (5, "c")}
    import glob
    assert not glob.glob(f"{path}_merge_*")


def test_write_partitioned_dynamic_overwrite(spark, tmp_path):
    """Dynamic overwrite replaces only the partitions present in the
    batch; static overwrite would truncate the whole table."""
    from k_means_using_mapreduce_spark.sources.sinks import write_partitioned

    p = str(tmp_path / "t")
    full = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3)],
        "day string, v int",
    )
    write_partitioned(full, p, ["day"])
    redrop = spark.createDataFrame([("2024-01-02", 99)], "day string, v int")
    write_partitioned(redrop, p, ["day"])
    # partition values come back type-inferred (date here) — compare
    # their string form
    got = sorted(
        (str(r["day"]), r["v"]) for r in spark.read.parquet(p).collect()
    )
    assert got == [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 99)]
    # static mode: the same re-drop wipes day=2024-01-01
    write_partitioned(redrop, p, ["day"], dynamic_overwrite=False)
    assert [r["v"] for r in spark.read.parquet(p).collect()] == [99]
    # session default restored either way
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        == "static"
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="partition_cols"):
        write_partitioned(full, p, [])
    with _pt.raises(ValueError, match="not in DataFrame"):
        write_partitioned(full, p, ["nope"])
