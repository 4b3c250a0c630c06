"""operators/index.py: posting-list semantics, boolean AND search,
TF-IDF ranking, and plan shapes (df-side broadcast; term filter before
the aggregate shuffle)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.index import (
    build_postings,
    search_all,
    tfidf_top_terms,
)
from k_means_using_mapreduce_spark.plans.explain import (
    broadcast_join_count,
    executed_plan,
    sort_merge_join_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "apple cherry durian"),
        (4, "  "),  # tokenless
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_exact_df_and_sorted_sample(docs):
    out = {r["token"]: r for r in build_postings(docs, max_postings=2).collect()}
    assert out["apple"]["df"] == 2 and out["apple"]["postings"] == "1,3"
    assert out["banana"]["df"] == 2 and out["banana"]["postings"] == "1,2"
    assert out["durian"]["df"] == 1 and out["durian"]["postings"] == "3"
    # the cap bounds the sample, not the count
    big = {r["token"]: r for r in build_postings(docs, max_postings=1).collect()}
    assert big["apple"]["df"] == 2 and big["apple"]["postings"] == "1"


def test_search_all_is_and_semantics(docs):
    assert [r["doc_id"] for r in search_all(docs, ["apple", "cherry"]).collect()] == [3]
    got = sorted(r["doc_id"] for r in search_all(docs, ["BANANA"]).collect())
    assert got == [1, 2]  # query terms are lowercased like the index
    assert search_all(docs, ["apple", "missing"]).count() == 0


def test_search_validation(docs):
    with pytest.raises(ValueError):
        search_all(docs, [])
    with pytest.raises(ValueError):
        search_all(docs, ["a", "A"])


def test_tfidf_scores_and_ranking(docs):
    out = tfidf_top_terms(docs, top=2)
    rows = {(r["doc_id"], r["token"]): r for r in out.collect()}
    # doc 1: apple tf=2 df=2, banana tf=1 df=2 -> apple ranks first.
    # N counts EVERY document (even tokenless ones): N=4 here, matching
    # the oracle's count(DISTINCT doc_id) FROM documents.
    assert rows[(1, "apple")]["tf"] == 2
    assert rows[(1, "apple")]["tfidf"] == pytest.approx(
        2 * math.log(4 / 2), abs=1e-6
    )
    # doc 3: durian df=1 beats shared terms
    d3 = sorted(t for (d, t) in rows if d == 3)
    assert "durian" in d3
    # tokenless doc contributes no rows
    assert not any(d == 4 for (d, _) in rows)


def test_tfidf_ties_break_by_token(spark):
    df = spark.createDataFrame([(1, "zeta alpha"), (2, "other")],
                               "doc_id long, text string")
    out = tfidf_top_terms(df, top=1).where(F.col("doc_id") == 1).collect()
    assert out[0]["token"] == "alpha"  # equal scores -> lexicographic


def test_plans(spark, sf_oracle):
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    tf = tfidf_top_terms(docs)
    tf.collect()
    assert broadcast_join_count(tf) >= 1  # df side broadcasts
    assert sort_merge_join_count(tf) == 0
    s = search_all(docs, ["dup", "vector"])
    s.collect()
    # the term filter runs before the aggregate's exchange
    plan = executed_plan(s)
    assert plan.index("Filter") > plan.index("Exchange") or "isin" not in plan.lower()


def test_hybrid_search_filters_then_ranks(spark):
    from k_means_using_mapreduce_spark.operators.index import hybrid_search

    docs = spark.createDataFrame(
        [(1, "apple pie"), (2, "apple tart"), (3, "banana")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_search(docs, emb, ["apple"], [1.0, 0.0], k=5).collect()
    # doc 3 matches the vector perfectly but fails the keyword filter
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["score"] == pytest.approx(1.0)


def test_hybrid_search_broadcasts_hit_set(spark, sf_oracle):
    from k_means_using_mapreduce_spark.operators.index import hybrid_search

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    out = hybrid_search(docs, emb, ["dup", "vector"], [0.0] * 63 + [1.0], k=10)
    out.collect()
    assert broadcast_join_count(out) >= 1
    assert sort_merge_join_count(out) == 0


def test_bm25_prefers_rare_term_and_respects_length(spark):
    from k_means_using_mapreduce_spark.operators.index import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "rare common common common"),
            (2, "common common common common"),
            (3, "rare rare filler filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    out = bm25_search(docs, ["rare", "common"], k=3).collect()
    ids = [r["doc_id"] for r in out]
    # doc 1 has both terms; 'rare' (df=2/3) outscores 'common' enough
    # that docs containing it beat the common-only doc
    assert ids[0] == 1
    assert set(ids) == {1, 2, 3}
    assert all(out[i]["score"] >= out[i + 1]["score"] for i in range(len(out) - 1))


def test_bm25_or_semantics_and_validation(spark):
    import pytest as _pytest

    from k_means_using_mapreduce_spark.operators.index import bm25_search

    docs = spark.createDataFrame(
        [(1, "apple"), (2, "banana"), (3, "cherry")], "doc_id long, text string"
    )
    out = bm25_search(docs, ["apple", "banana"], k=10).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]  # OR, not AND
    with _pytest.raises(ValueError):
        bm25_search(docs, [])
    with _pytest.raises(ValueError):
        bm25_search(docs, ["x", "X"])
    with _pytest.raises(ValueError):
        bm25_search(docs, ["x"], k=0)


def test_rrf_fuse_closed_form(spark):
    """Two 3-item lists with one shared id: hand-computed RRF."""
    from k_means_using_mapreduce_spark.operators.index import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (4, 0.8), (5, 0.7)], "doc_id long, score double"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k0=60, top=10).collect()}
    assert out[3]["rrf_score"] == pytest.approx(1 / 63 + 1 / 61)
    assert out[3]["n_lists"] == 2
    assert out[1]["rrf_score"] == pytest.approx(1 / 61)
    # the doubly-ranked doc outranks every single-list doc here
    ordered = [r["doc_id"] for r in rrf_fuse([a, b], k0=60, top=3).collect()]
    assert ordered[0] == 3
    with pytest.raises(ValueError, match="rankings"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k0"):
        rrf_fuse([a], k0=0)
