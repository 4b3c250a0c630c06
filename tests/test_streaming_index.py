"""Streaming IVF ingestion (streaming/index_ingest.py): cross-batch
searchability, replay idempotence, partition-pruned probes, and parity
with a batch-built index over the same rows."""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.similarity import (
    topk_for_query,
)
from k_means_using_mapreduce_spark.plans.explain import executed_plan
from k_means_using_mapreduce_spark.sources.loaders import load_table
from k_means_using_mapreduce_spark.streaming.index_ingest import IvfIngestSink

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def cents(emb):
    from k_means_using_mapreduce_spark.operators.kmeans import kmeans_fit

    fit = kmeans_fit(
        emb.selectExpr("cast(embedding as array<double>) as features"),
        4,
        seed=5,
        max_iter=8,
    )
    return fit.centroids


def _query_vec(emb, vec_id=3):
    return list(emb.where(F.col("vec_id") == vec_id).first()["embedding"])


def test_ingest_two_batches_then_search(spark, emb, cents, tmp_path):
    sink = IvfIngestSink(spark, str(tmp_path / "idx"), cents)
    sink(emb.where(F.col("vec_id") < 250), 0)
    sink(emb.where(F.col("vec_id") >= 250), 1)
    corpus = sink.corpus()
    assert corpus.count() == emb.count()
    assert set(corpus.select("batch").distinct().toPandas()["batch"]) == {0, 1}
    # full probe == exact brute force over the same rows
    q = _query_vec(emb)
    got = [r["vec_id"] for r in sink.topk(q, k=10, nprobe=4).collect()]
    exact = [
        r["vec_id"] for r in topk_for_query(emb, q, k=10, metric="cosine").collect()
    ]
    assert got == exact


def test_replay_is_noop_and_midcrash_safe(spark, emb, cents, tmp_path):
    sink = IvfIngestSink(spark, str(tmp_path / "idx"), cents)
    b0 = emb.where(F.col("vec_id") < 100)
    sink(b0, 0)
    n = sink.corpus().count()
    sink(b0, 0)  # committed replay → skip
    assert sink.corpus().count() == n == 100
    # simulate a crash AFTER files landed but BEFORE the marker moved:
    # batch 1 written, marker rolled back, then the batch replays
    b1 = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
    sink(b1, 1)
    with open(sink._marker(), "w") as fh:
        fh.write("0")
    sink(b1, 1)  # replay overwrites batch=1 subtree, no double-ingest
    assert sink.corpus().count() == 150
    assert sink.committed_batch() == 1


def test_probe_is_partition_pruned(spark, emb, cents, tmp_path):
    sink = IvfIngestSink(spark, str(tmp_path / "idx"), cents)
    sink(emb, 0)
    q = _query_vec(emb)
    plan = executed_plan(sink.topk(q, k=5, nprobe=2))
    assert "PartitionFilters: [" in plan
    assert "cid" in plan.split("PartitionFilters:")[1][:160]
    assert "PushedFilters: []" in plan


def test_centroids_persisted_and_streaming_source(spark, emb, cents, tmp_path):
    # drive through a real availableNow stream for the wiring
    rows = [
        {"vec_id": int(r["vec_id"]), "embedding": [float(v) for v in r["embedding"]]}
        for r in emb.limit(40).collect()
    ]
    d = tmp_path / "in"
    d.mkdir()
    with open(d / "b0.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    src = spark.readStream.schema("vec_id long, embedding array<double>").json(
        str(d)
    )
    sink = IvfIngestSink(spark, str(tmp_path / "idx"), cents)
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sink.corpus().count() == 40
    saved = spark.read.parquet(str(tmp_path / "idx" / "centroids"))
    assert saved.count() == len(cents)
    assert sink.topk(_query_vec(emb), k=3, nprobe=4).count() == 3
