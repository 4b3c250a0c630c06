"""operators/bloomjoin.py: superset guarantee, false-positive rate,
saturation behavior, sizing math, and the zero-probe-shuffle plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.bloomjoin import (
    bloom_semi_join,
    build_bloom_bitmap,
    suggest_params,
)
from k_means_using_mapreduce_spark.plans.explain import (
    exchange_count,
    executed_plan,
    sort_merge_join_count,
)


@pytest.fixture(scope="module")
def tables(spark):
    probe = spark.createDataFrame(
        [(i, f"p{i}") for i in range(2000)], "key long, payload string"
    )
    build = spark.createDataFrame(
        [(i,) for i in range(0, 2000, 10)], "key long"
    )  # 200 true members
    return probe, build


def test_superset_of_exact_semi_join(tables):
    probe, build = tables
    out = bloom_semi_join(
        probe, build, "key", "key", num_bits=4096, num_hashes=5
    )
    got = {r["key"] for r in out.collect()}
    exact = {r["key"] for r in probe.join(build, "key", "left_semi").collect()}
    assert exact <= got  # no false negatives, ever
    # 4096 bits / 200 keys / 5 hashes -> load 0.22, fpp ~ (1-e^-0.24)^5
    fpp = (1 - math.exp(-5 * 200 / 4096)) ** 5
    false_pos = len(got) - len(exact)
    assert false_pos <= max(20, 3 * fpp * 1800)


def test_saturated_bitmap_passes_everything_never_drops(tables):
    probe, build = tables
    out = bloom_semi_join(
        probe, build, "key", "key", num_bits=64, num_hashes=5
    )
    # 200 keys x 5 hashes into 64 bits: fully saturated -> pass-through
    assert out.count() == probe.count()


def test_bitmap_is_dense_and_deterministic(spark):
    build = spark.createDataFrame([(i,) for i in range(50)], "key long")
    a = build_bloom_bitmap(build, "key", num_bits=512, num_hashes=3).collect()[0]
    b = (
        build_bloom_bitmap(
            build.repartition(7), "key", num_bits=512, num_hashes=3
        ).collect()[0]
    )
    assert len(a["words"]) == 8
    assert a["words"] == b["words"]  # partitioning-invariant
    assert sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in a["words"]) <= 150


def test_empty_build_side_rejects_all(tables):
    probe, build = tables
    out = bloom_semi_join(
        probe, build.filter(F.col("key") < 0), "key", "key",
        num_bits=4096, num_hashes=5,
    )
    assert out.count() == 0


def test_suggest_params_standard_formula():
    num_bits, num_hashes = suggest_params(1_000_000, fpp=0.01)
    assert num_bits % 64 == 0
    assert 9.5e6 < num_bits < 9.7e6  # ~9.585e6 bits for 1M keys @ 1%
    assert num_hashes == 7
    with pytest.raises(ValueError):
        suggest_params(0)
    with pytest.raises(ValueError):
        suggest_params(10, fpp=1.5)


def test_probe_side_has_no_shuffle(tables):
    """Both exchanges in the plan belong to the tiny bitmap build
    (word groupBy + single-partition assembly); the probe reaches its
    filter without shuffling, via one broadcast."""
    probe, build = tables
    out = bloom_semi_join(
        probe, build, "key", "key", num_bits=4096, num_hashes=5
    )
    out.collect()
    assert exchange_count(out) == 2
    assert sort_merge_join_count(out) == 0
    assert "BroadcastNestedLoopJoin" in executed_plan(out)
