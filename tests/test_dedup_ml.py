"""MLlib LSH fast paths and TF-IDF clustering pipeline."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark.operators import dedup_ml as DM


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    rows = [
        (1, base),
        (2, base),
        (3, near),
        (4, "spark shuffles hash partitions across executors with adaptive plans"),
        (5, "completely different text about nothing in particular at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_planted_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_dist"]
        for r in DM.minhash_lsh_pairs(docs, jaccard_threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0.0
    assert (1, 3) in pairs or (2, 3) in pairs
    assert not any(4 in k and 5 in k for k in pairs)


def test_minhash_lsh_deterministic(docs):
    a = sorted(map(str, DM.minhash_lsh_pairs(docs).collect()))
    b = sorted(map(str, DM.minhash_lsh_pairs(docs).collect()))
    assert a == b


def test_brp_lsh_ann(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    first = emb.select("embedding").first()["embedding"]
    out = DM.brp_lsh_ann(emb, [float(v) for v in first], k=5)
    rows = out.collect()
    assert 1 <= len(rows) <= 5
    # the query point itself must be the nearest (dist 0)
    assert rows[0]["dist"] == pytest.approx(0.0, abs=1e-6)


def test_tfidf_cluster_documents(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = DM.cluster_documents_tfidf(docs, k=4, max_iter=10)
    rows = out.collect()
    assert len(rows) == docs.count()
    clusters = {r["cluster"] for r in rows}
    assert clusters <= {0, 1, 2, 3} and len(clusters) >= 2
