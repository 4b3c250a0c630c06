"""Sparse all-pairs cosine (operators/simpairs.py): exact values vs a
numpy recomputation, DIMSUM degradation-to-exact, sampling facts,
caps, and validation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.simpairs import (
    cosine_pairs,
    cosine_pairs_dimsum,
    doc_term_weights,
)


@pytest.fixture(scope="module")
def weights(spark):
    rows = [
        (1, "a b b c"),
        (2, "a b b c"),          # exact dup of 1
        (3, "a b c d d d"),
        (4, "x y z"),            # disjoint from 1-3 except nothing shared
        (5, "a x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return doc_term_weights(df).cache()


def _numpy_cosines(weights):
    import collections

    vecs: dict[int, dict[str, float]] = collections.defaultdict(dict)
    for r in weights.collect():
        vecs[r["id"]][r["token"]] = r["w"]
    out = {}
    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            num = sum(vecs[i][t] * vecs[j].get(t, 0.0) for t in vecs[i])
            ni = math.sqrt(sum(v * v for v in vecs[i].values()))
            nj = math.sqrt(sum(v * v for v in vecs[j].values()))
            if ni > 0 and nj > 0:
                out[(i, j)] = num / (ni * nj)
    return out


def test_exact_matches_numpy(weights):
    got = {
        (r["id1"], r["id2"]): r["cosine"]
        for r in cosine_pairs(weights, threshold=0.01).collect()
    }
    want = {k: v for k, v in _numpy_cosines(weights).items() if v >= 0.01}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert got[(1, 2)] == pytest.approx(1.0, abs=1e-12)  # exact dup


def test_dimsum_degrades_to_exact_at_large_gamma(weights):
    exact = {
        (r["id1"], r["id2"]): r["cosine"]
        for r in cosine_pairs(weights, threshold=0.01).collect()
    }
    est = {
        (r["id1"], r["id2"]): r["cosine_est"]
        for r in cosine_pairs_dimsum(
            weights, threshold=0.01, gamma=1e9
        ).collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert est[k] == pytest.approx(exact[k], abs=1e-12)


def test_dimsum_is_deterministic_and_actually_samples(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    w = doc_term_weights(docs).cache()
    lo = cosine_pairs_dimsum(w, threshold=0.5, gamma=0.5)
    a = sorted(map(tuple, lo.collect()))
    b = sorted(map(tuple, lo.sparkSession.createDataFrame(w.rdd, w.schema)
                   .transform(lambda d: cosine_pairs_dimsum(d, threshold=0.5, gamma=0.5))
                   .collect()))
    # same input -> same SELECTION and same estimate up to float-sum
    # reduce order (bit-exactness of a distributed double sum is not
    # promised; the md5 coin decides membership deterministically)
    assert [(x[0], x[1]) for x in a] == [(x[0], x[1]) for x in b]
    for x, y in zip(a, b):
        assert x[2] == pytest.approx(y[2], abs=1e-9)
    # with a small gamma at least one pair's estimate differs from exact
    exact = {
        (r["id1"], r["id2"]): r["cosine"]
        for r in cosine_pairs(w, threshold=0.5).collect()
    }
    est = {(r[0], r[1]): r[2] for r in a}
    assert any(
        k not in est or abs(est[k] - v) > 1e-9 for k, v in exact.items()
    ), "gamma=0.5 should visibly sample"


def test_max_df_cap_drops_hot_terms(spark):
    rows = [(i, "hot rare%d" % (i % 2)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w = doc_term_weights(df)
    capped = cosine_pairs(w, threshold=0.0001, max_df=4)
    # 'hot' (df=6) is dropped; rare0/rare1 have df=3 <= 4 and carry all mass
    for r in capped.collect():
        assert (r["id1"] % 2) == (r["id2"] % 2)


def test_validation(weights):
    with pytest.raises(ValueError, match="threshold"):
        cosine_pairs(weights, threshold=0.0)
    with pytest.raises(ValueError, match="gamma"):
        cosine_pairs_dimsum(weights, gamma=0.0)
    with pytest.raises(ValueError, match="max_df"):
        cosine_pairs(weights, threshold=0.5, max_df=1)
