"""JSONL ingestion policies + streaming watermarked dedup."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.sources.loaders import read_jsonl
from k_means_using_mapreduce_spark.streaming import streaming_dedup

GOOD = [{"doc_id": 1, "text": "hello"}, {"doc_id": 2, "text": "world"}]
BAD_LINE = '{"doc_id": oops not json'


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for r in GOOD:
            f.write(json.dumps(r) + "\n")
        f.write(BAD_LINE + "\n")
    return str(p)


class TestReadJsonl:
    def test_permissive_quarantines_bad_rows(self, spark, jsonl_file):
        df = read_jsonl(spark, jsonl_file, "doc_id LONG, text STRING")
        rows = df.collect()
        assert len(rows) == 3
        bad = [r for r in rows if r["_corrupt_record"] is not None]
        assert len(bad) == 1 and bad[0]["doc_id"] is None
        assert BAD_LINE in bad[0]["_corrupt_record"]

    def test_dropmalformed(self, spark, jsonl_file):
        df = read_jsonl(
            spark, jsonl_file, "doc_id LONG, text STRING", mode="DROPMALFORMED"
        )
        assert sorted(r["doc_id"] for r in df.collect()) == [1, 2]

    def test_failfast_raises(self, spark, jsonl_file):
        df = read_jsonl(
            spark, jsonl_file, "doc_id LONG, text STRING", mode="FAILFAST"
        )
        with pytest.raises(Exception, match="FAILFAST|Malformed"):
            df.collect()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    d = tmp_path / "dups_in"
    d.mkdir()
    rows = [
        {"k": "a", "ts": "2024-01-01 00:00:00"},
        {"k": "a", "ts": "2024-01-01 00:05:00"},  # dup inside horizon
        {"k": "b", "ts": "2024-01-01 00:01:00"},
    ]
    with open(d / "b0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("k STRING, ts STRING")
        .json(str(d))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = streaming_dedup(stream, ["k"], watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        got = 0
        while time.time() < deadline and got < 2:
            q.processAllAvailable()
            got = spark.sql("select count(*) c from dedup_out").first()["c"]
        ks = sorted(
            r["k"] for r in spark.sql("select k from dedup_out").collect()
        )
        assert ks == ["a", "b"]  # duplicate 'a' suppressed
    finally:
        q.stop()


def test_format_roundtrips(spark, tmp_path, sf_small):
    """parquet/orc/json round-trips preserve values; orc keeps types."""
    from k_means_using_mapreduce_spark.sources.loaders import write_read_format

    src = spark.read.parquet(f"{sf_small}/supplier.parquet")
    want = sorted(map(tuple, src.collect()))
    for fmt in ("parquet", "orc", "json"):
        back = write_read_format(src, str(tmp_path / fmt), fmt)
        got = sorted(map(tuple, back.select(*src.columns).collect()))
        assert got == want, fmt
        if fmt in ("parquet", "orc"):
            assert dict(back.dtypes) == dict(src.dtypes), fmt


def test_format_roundtrip_rejects_unknown(spark, tmp_path):
    import pytest

    from k_means_using_mapreduce_spark.sources.loaders import write_read_format

    with pytest.raises(ValueError, match="unsupported"):
        write_read_format(spark.range(1), str(tmp_path / "x"), "avro")
