"""Product quantization (operators/pq.py): codebook training with the
engine's own K-Means, numpy encode kernel, literal-LUT ADC scoring,
refine-stage recall recovery, reconstruction-error monotonicity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.pq import (
    adc_lut,
    encode_pq,
    pq_error_stats,
    pq_topk,
    pq_topk_refined,
    train_pq_codebooks,
)
from k_means_using_mapreduce_spark.operators.similarity import topk_for_query
from k_means_using_mapreduce_spark.sources.loaders import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def books(emb):
    return train_pq_codebooks(emb, m=8, n_codes=64, seed=7, max_iter=8)


@pytest.fixture(scope="module")
def codes(emb, books):
    return encode_pq(emb, books).cache()


def test_codebook_shape_and_determinism(emb, books):
    assert len(books) == 8
    assert all(len(b) == 64 for b in books)
    assert all(len(c) == 8 for b in books for c in b)
    again = train_pq_codebooks(emb, m=8, n_codes=64, seed=7, max_iter=8)
    assert books == again


def test_encode_shape_and_range(emb, codes):
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 64 for c in r["codes"])


def test_adc_lut_shape(books):
    q = [0.0] * 64
    lut = adc_lut(books, q)
    assert len(lut) == 8 and all(len(row) == 64 for row in lut)
    assert all(v >= 0.0 for row in lut for v in row)
    with pytest.raises(ValueError):
        adc_lut(books, [0.0] * 63)


def _query_vec(emb, vec_id=3):
    return list(
        emb.where(F.col("vec_id") == vec_id).first()["embedding"]
    )


def test_adc_recall_and_refined_recall(emb, books, codes):
    q = _query_vec(emb)
    exact = {
        r["vec_id"]
        for r in topk_for_query(emb, q, k=10, metric="sq_dist").collect()
    }
    adc = {r["vec_id"] for r in pq_topk(codes, books, q, k=10).collect()}
    # the synthetic embeddings are near-unit-norm with weak cluster
    # structure (PQ reconstruction captures ~2/3 of the energy at 64
    # codes), so raw ADC is a candidate generator here, not the final
    # ranking — the refine stage is the recall story, as in FAISS
    assert len(exact & adc) >= 3
    refined = {
        r["vec_id"]
        for r in pq_topk_refined(
            codes, emb, books, q, k=10, refine_factor=8
        ).collect()
    }
    assert len(exact & refined) >= 7


def test_refined_scores_are_exact(emb, books, codes):
    q = _query_vec(emb, vec_id=11)
    got = pq_topk_refined(codes, emb, books, q, k=5, refine_factor=8).collect()
    exact = topk_for_query(emb, q, k=50, metric="sq_dist").collect()
    exact_by_id = {r["vec_id"]: r["score"] for r in exact}
    for r in got:
        assert r["sq_dist"] == pytest.approx(exact_by_id[r["vec_id"]], rel=1e-9)


def test_error_decreases_with_codebook_size(emb):
    small = train_pq_codebooks(emb, m=4, n_codes=4, seed=7, max_iter=6)
    big = train_pq_codebooks(emb, m=4, n_codes=32, seed=7, max_iter=6)
    e_small = pq_error_stats(emb, small).first()
    e_big = pq_error_stats(emb, big).first()
    assert e_small["n_rows"] == e_big["n_rows"] == emb.count()
    assert e_big["mean_sq_err"] < e_small["mean_sq_err"]
    assert e_big["mean_sq_err"] > 0.0


def test_expression_encoder_matches_numpy_kernel(spark, emb):
    """The contract query's pure-expression encoder (literal frozen
    codebooks) and the production numpy mapInPandas kernel must assign
    identical codes — the parity the pq_queries docstring claims."""
    from k_means_using_mapreduce_spark.contract_constants import PQ_CODEBOOKS
    from k_means_using_mapreduce_spark.contracts.pq_queries import (
        pq_adc_embeddings,
    )

    expr = {
        r["vec_id"]: [r[f"code_{j}"] for j in range(4)]
        for r in pq_adc_embeddings(spark, SF_DIR).collect()
    }
    kernel = {
        r["vec_id"]: list(r["codes"])
        for r in encode_pq(emb, PQ_CODEBOOKS).collect()
    }
    assert expr == kernel


def test_validation(emb):
    with pytest.raises(ValueError):
        train_pq_codebooks(emb, m=7, n_codes=4)  # 64 % 7 != 0
    with pytest.raises(ValueError):
        train_pq_codebooks(emb, m=0)
    with pytest.raises(ValueError):
        train_pq_codebooks(emb, m=4, n_codes=1)


def test_pq_knn_join_matches_single_query_path(emb, books, codes):
    """The batched multi-query kernel must agree with the expression
    path (pq_topk) query-by-query — same LUTs, same tie policy."""
    from k_means_using_mapreduce_spark.operators.pq import pq_knn_join

    queries = emb.where(F.col("vec_id") < 3)
    got = pq_knn_join(codes, queries, books, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["adc_sq_dist"])
        )
    assert set(by_q) == {0, 1, 2}
    for qid, rows in by_q.items():
        q = _query_vec(emb, vec_id=qid)
        solo = [
            r["vec_id"]
            for r in pq_topk(codes, books, q, k=6).collect()
            if r["vec_id"] != qid
        ][:5]
        assert [n for _, n, _ in sorted(rows)] == solo


def test_pq_knn_join_validation(emb, books, codes):
    from k_means_using_mapreduce_spark.operators.pq import pq_knn_join

    with pytest.raises(ValueError):
        pq_knn_join(codes, emb.where(F.col("vec_id") < 0), books, k=3)
    with pytest.raises(ValueError):
        pq_knn_join(codes, emb.limit(1), books, k=0)


# ---------------- IVF-PQ: persisted composed index ----------------


@pytest.fixture(scope="module")
def ivfpq(spark, emb, tmp_path_factory):
    from k_means_using_mapreduce_spark.operators.kmeans import kmeans_fit
    from k_means_using_mapreduce_spark.operators.pq import (
        build_ivfpq_index,
        residuals,
    )

    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    fit = kmeans_fit(
        emb.selectExpr("cast(embedding as array<double>) as features"),
        4,
        seed=5,
        max_iter=8,
    )
    # codebooks trained on the residual distribution, as recommended
    res = residuals(emb, fit.centroids)
    books = train_pq_codebooks(
        res, m=8, n_codes=64, vec_col="residual", seed=7, max_iter=8
    )
    build_ivfpq_index(emb, fit.centroids, books, path)
    return {"path": path, "centroids": fit.centroids, "books": books}


def test_ivfpq_layout_and_roundtrip(spark, ivfpq):
    import glob

    from k_means_using_mapreduce_spark.operators.pq import load_pq_codebooks

    dirs = sorted(glob.glob(f"{ivfpq['path']}/corpus/cid=*"))
    assert len(dirs) == 4
    assert load_pq_codebooks(spark, ivfpq["path"]) == ivfpq["books"]
    corpus = spark.read.parquet(f"{ivfpq['path']}/corpus")
    assert set(corpus.columns) == {"vec_id", "codes", "cid"}


def test_ivfpq_probe_is_partition_pruned(spark, ivfpq, emb):
    from k_means_using_mapreduce_spark.operators.pq import ivfpq_topk
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    q = _query_vec(emb)
    df = ivfpq_topk(spark, ivfpq["path"], q, k=10, nprobe=2)
    plan = executed_plan(df)
    assert "PartitionFilters: [" in plan
    assert "cid" in plan.split("PartitionFilters:")[1][:120]
    assert "PushedFilters: []" in plan


def test_ivfpq_full_probe_refined_recall(spark, ivfpq, emb):
    from k_means_using_mapreduce_spark.operators.pq import (
        ivfpq_topk,
        ivfpq_topk_refined,
    )

    q = _query_vec(emb)
    exact = {
        r["vec_id"]
        for r in topk_for_query(emb, q, k=10, metric="sq_dist").collect()
    }
    # nprobe = all buckets isolates PQ loss from bucket loss
    refined = {
        r["vec_id"]
        for r in ivfpq_topk_refined(
            spark, ivfpq["path"], emb, q, k=10, nprobe=4, refine_factor=8
        ).collect()
    }
    assert len(exact & refined) >= 7
    # and a restricted probe still returns k rows, deterministically
    a = ivfpq_topk(spark, ivfpq["path"], q, k=10, nprobe=1).collect()
    b = ivfpq_topk(spark, ivfpq["path"], q, k=10, nprobe=1).collect()
    assert a == b and len(a) == 10


def test_ivfpq_refined_scores_exact(spark, ivfpq, emb):
    from k_means_using_mapreduce_spark.operators.pq import ivfpq_topk_refined

    q = _query_vec(emb, vec_id=11)
    got = ivfpq_topk_refined(
        spark, ivfpq["path"], emb, q, k=5, nprobe=4, refine_factor=8
    ).collect()
    exact = topk_for_query(emb, q, k=200, metric="sq_dist").collect()
    by_id = {r["vec_id"]: r["score"] for r in exact}
    for r in got:
        assert r["sq_dist"] == pytest.approx(by_id[r["vec_id"]], rel=1e-9)


def test_ivfpq_expr_matches_persisted_index_path(spark, ivfpq, emb):
    """The index-free in-plan composition (ivfpq_topk_expr) returns the
    SAME ids and exact distances as the persisted-index twin
    (ivfpq_topk_refined) for identical (query, k, nprobe, refine) —
    the only difference is where the codes live."""
    from k_means_using_mapreduce_spark.operators.pq import (
        ivfpq_topk_expr,
        ivfpq_topk_refined,
    )

    q = _query_vec(emb)
    got = ivfpq_topk_expr(
        emb, ivfpq["centroids"], ivfpq["books"], q,
        k=5, nprobe=2, refine_factor=4,
    ).collect()
    want = ivfpq_topk_refined(
        spark, ivfpq["path"], emb, q, k=5, nprobe=2, refine_factor=4
    ).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
    assert [r["sq_dist"] for r in got] == [r["sq_dist"] for r in want]


def test_ivfpq_expr_self_query_and_guards(spark, ivfpq, emb):
    """A corpus vector queried against the index finds itself at exact
    distance 0 after the refine stage; parameter validation raises."""
    from k_means_using_mapreduce_spark.operators.pq import ivfpq_topk_expr

    q = _query_vec(emb, vec_id=7)
    top = ivfpq_topk_expr(
        emb, ivfpq["centroids"], ivfpq["books"], q, k=1, nprobe=1
    ).collect()
    assert top[0]["vec_id"] == 7
    assert top[0]["sq_dist"] == 0.0

    with pytest.raises(ValueError, match="refine_factor"):
        ivfpq_topk_expr(
            emb, ivfpq["centroids"], ivfpq["books"], q, refine_factor=0
        )
    with pytest.raises(ValueError, match="k must be"):
        ivfpq_topk_expr(emb, ivfpq["centroids"], ivfpq["books"], q, k=0)
