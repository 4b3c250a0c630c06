"""Multimodal plumbing: real Spark-side schema/batching, stubbed codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synth_media(spark, n=50).cache()


def test_synth_media_schema(media):
    assert media.schema == M.MEDIA_SCHEMA or set(media.columns) == {
        "asset_id", "media_type", "payload", "width", "height", "duration_ms"
    }
    assert media.count() == 50


def test_extract_features_end_to_end(media):
    feats = M.extract_features(media, rows_per_batch=16)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == M.FEATURE_DIM for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feature"])
    # payload = sha2-512 hex string cast to binary → 128 bytes
    assert all(r["n_bytes"] == 128 for r in rows)


def test_extract_features_deterministic(media):
    a = sorted(map(str, M.extract_features(media).collect()))
    b = sorted(map(str, M.extract_features(media).collect()))
    assert a == b


def test_features_feed_kmeans(media, spark):
    from k_means_using_mapreduce_spark.operators.kmeans import kmeans_fit

    feats = M.extract_features(media).select(F.col("feature").alias("features"))
    res = kmeans_fit(feats, 3, seed=1, max_iter=10)
    assert len(res.centroids) == 3
    assert sum(res.cluster_sizes.values()) == 50


def test_null_payload_handled(spark):
    df = spark.createDataFrame(
        [(1, "image", None, None, None, None)], M.MEDIA_SCHEMA
    )
    row = M.extract_features(df).first()
    assert row["n_bytes"] == 0 and row["feature"] == [0.0] * M.FEATURE_DIM


def test_stubs_fail_at_execution_not_plan_time(media):
    plan = M.resize_stub(media, 32, 32)  # plan builds fine
    assert plan.schema == M.MEDIA_SCHEMA
    with pytest.raises(Exception, match="NotImplementedError|image codec|resize"):
        plan.collect()


def test_byte_stats_closed_form(spark):
    """Known payloads: constant bytes -> entropy 0 + tiny zlib ratio;
    a PNG magic prefix sniffs as png; NULL/empty handled."""
    import math
    import zlib

    from k_means_using_mapreduce_spark.operators.multimodal import byte_stats

    const = b"a" * 4096
    png = b"\x89PNG\r\n\x1a\n" + bytes(range(256)) * 8
    rows = [
        (1, "image", bytearray(const)),
        (2, "image", bytearray(png)),
        (3, "audio", None),
        (4, "audio", bytearray(b"")),
    ]
    df = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    got = {r["asset_id"]: r for r in byte_stats(df).collect()}
    assert got[1]["entropy_bits"] == pytest.approx(0.0, abs=1e-12)
    assert got[1]["zlib_ratio"] == pytest.approx(
        len(zlib.compress(const, 6)) / len(const)
    )
    assert got[1]["zlib_ratio"] < 0.05  # constant bytes compress away
    assert got[2]["sniffed_format"] == "png"
    # 256 equally-likely byte values in the body dominate -> near 8 bits
    assert got[2]["entropy_bits"] > 7.9
    assert got[3]["n_bytes"] is None and got[3]["sniffed_format"] is None
    assert got[4]["n_bytes"] == 0 and got[4]["entropy_bits"] == 0.0
