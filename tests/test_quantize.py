"""operators/quantize.py: code range, round-trip error bound, new-batch
quantization with corpus scales, degenerate dims, narrow plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.quantize import (
    LEVELS,
    dequantize,
    dim_stats,
    quantization_error_stats,
    quantize_vectors,
)
from k_means_using_mapreduce_spark.plans.explain import exchange_count


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet")


def test_codes_in_range_and_extremes_hit(emb):
    q = quantize_vectors(emb)
    mm = q.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).collect()[0]
    assert mm["lo"] == 0 and mm["hi"] == LEVELS  # min/max scaling is tight


def test_roundtrip_error_bounded_by_half_scale(emb):
    out = quantization_error_stats(emb).collect()
    assert len(out) == 64
    for r in out:
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-9, r


def test_constant_dim_quantizes_to_zero(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [1.0, 7.0])], "id long, embedding array<double>"
    )
    q = quantize_vectors(df).orderBy("id").collect()
    assert [r["codes"][0] for r in q] == [0, 0]  # constant dim -> scale 0
    assert q[0]["codes"][1] == 0 and q[1]["codes"][1] == LEVELS


def test_new_batch_uses_corpus_scales_and_clamps(spark):
    corpus = spark.createDataFrame(
        [(1, [0.0]), (2, [10.0])], "id long, embedding array<double>"
    )
    stats = dim_stats(corpus)
    batch = spark.createDataFrame(
        [(3, [-5.0]), (4, [5.0]), (5, [99.0])], "id long, embedding array<double>"
    )
    q = quantize_vectors(batch, stats).orderBy("id").collect()
    codes = [r["codes"][0] for r in q]
    assert codes[0] == 0 and codes[2] == LEVELS  # out-of-range clamps
    assert codes[1] == round(5.0 / 10.0 * LEVELS)


def test_dequantize_inverts_codes(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 2.0]), (2, [10.0, 4.0])], "id long, embedding array<double>"
    )
    stats = dim_stats(df)
    rows = stats.collect()
    q = quantize_vectors(df, stats)
    recon = q.select("id", dequantize("codes", rows, col_name="approx"))
    for r in recon.orderBy("id").collect():
        orig = [0.0, 2.0] if r["id"] == 1 else [10.0, 4.0]
        for a, b in zip(r["approx"], orig):
            assert a == pytest.approx(b, abs=1e-9)


def test_quantize_is_narrow_no_shuffle(emb):
    stats = dim_stats(emb)
    q = quantize_vectors(emb, stats)
    q.collect()
    assert exchange_count(q) == 0  # literal-folded scales: pure projection


def test_empty_stats_raises(spark):
    empty = spark.createDataFrame([], "id long, embedding array<double>")
    with pytest.raises(ValueError):
        quantize_vectors(empty)
