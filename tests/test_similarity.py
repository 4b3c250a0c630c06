"""Similarity-search operator semantics."""

from __future__ import annotations

import math

import pytest

from k_means_using_mapreduce_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [-1.0, 0.0]),
        (5, [0.7, 0.7]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_topk_cosine_order(emb):
    got = [r["vec_id"] for r in S.topk_for_query(emb, [1.0, 0.0], k=3).collect()]
    assert got == [1, 2, 5]


def test_topk_sq_dist(emb):
    got = [r["vec_id"] for r in S.topk_for_query(emb, [1.0, 0.0], k=2, metric="sq_dist").collect()]
    assert got == [1, 2]


def test_topk_score_values(emb):
    rows = S.topk_for_query(emb, [1.0, 0.0], k=5).collect()
    scores = {r["vec_id"]: r["score"] for r in rows}
    assert scores[1] == pytest.approx(1.0)
    assert scores[5] == pytest.approx(math.cos(math.pi / 4))
    assert scores[4] == pytest.approx(-1.0)


def test_knn_join_excludes_self(emb):
    out = S.knn_join(emb, emb.filter("vec_id = 1"), k=2).collect()
    ids = [(r["query_id"], r["neighbor_id"], r["rank"]) for r in out]
    assert (1, 2, 1) in ids and (1, 5, 2) in ids
    assert all(r["neighbor_id"] != 1 for r in out)


def test_ivf_probes_restrict_scan(emb):
    cents = [(1, [1.0, 0.0]), (2, [-1.0, 0.0])]
    # query near +x with nprobe=1 → bucket 1 only → vec 4 (in bucket 2) unreachable
    got = [r["vec_id"] for r in S.ivf_topk_for_query(emb, cents, [1.0, 0.05], k=5, nprobe=1).collect()]
    assert 4 not in got and 1 in got
    # nprobe=2 → full recall
    got2 = [r["vec_id"] for r in S.ivf_topk_for_query(emb, cents, [1.0, 0.05], k=5, nprobe=2).collect()]
    assert set(got2) == {1, 2, 3, 4, 5}


def test_ivf_matches_bruteforce_with_full_probes(emb):
    cents = [(1, [1.0, 0.0]), (2, [-1.0, 0.0])]
    brute = [(r["vec_id"], round(r["score"], 12)) for r in S.topk_for_query(emb, [0.5, 0.5], k=5).collect()]
    ivf = [(r["vec_id"], round(r["score"], 12)) for r in S.ivf_topk_for_query(emb, cents, [0.5, 0.5], k=5, nprobe=2).collect()]
    assert brute == ivf


def test_ivf_recall_monotone_and_exhaustive_at_full_probe(spark, sf_oracle):
    """Recall is non-decreasing in nprobe and exactly 1.0 when every
    cell is probed (pruned search == exact search by construction)."""
    from k_means_using_mapreduce_spark.contract_constants import (
        EMBEDDING_CENTROIDS,
    )
    from k_means_using_mapreduce_spark.operators.similarity import (
        ivf_recall,
    )
    from k_means_using_mapreduce_spark.sources.loaders import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    out = {
        r["nprobe"]: r
        for r in ivf_recall(
            emb,
            EMBEDDING_CENTROIDS,
            max_query_id=10,
            k=5,
            nprobes=(1, 2, 4),
        ).collect()
    }
    assert out[4]["mean_recall"] == 1.0
    assert out[1]["mean_recall"] <= out[2]["mean_recall"] <= 1.0
    assert out[1]["n_queries"] == 10

    import pytest as _p

    with _p.raises(ValueError, match="k must"):
        ivf_recall(emb, EMBEDDING_CENTROIDS, k=0)
    with _p.raises(ValueError, match="nprobes"):
        ivf_recall(emb, EMBEDDING_CENTROIDS, nprobes=())
