"""operators/encode.hashed_features: determinism, conservation of
signed mass, and profile consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.encode import (
    hashed_corpus_profile,
    hashed_features,
)


def _docs(spark):
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "beta beta delta"),
        (3, "   "),  # whitespace-only -> zero tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_deterministic_and_within_dims(spark):
    a = sorted(map(tuple, hashed_features(_docs(spark), "text", 16).collect()))
    b = sorted(map(tuple, hashed_features(_docs(spark), "text", 16).collect()))
    assert a == b
    assert all(0 <= dim < 16 for _, dim, _ in a)
    assert all(isinstance(w, int) for _, _, w in a)


def test_signed_mass_is_conserved(spark):
    # Per doc: sum of weights == sum of token signs; total |signs| = token count.
    feats = hashed_features(_docs(spark), "text", 4)
    per_doc = {
        r["id"]: (r["s"], r["a"])
        for r in feats.groupBy("id")
        .agg(F.sum("weight").alias("s"), F.sum(F.abs("weight")).alias("a"))
        .collect()
    }
    # doc 1 has 4 tokens, doc 2 has 3; |sum| <= abs-sum <= token count.
    assert abs(per_doc[1][0]) <= per_doc[1][1] <= 4
    assert abs(per_doc[2][0]) <= per_doc[2][1] <= 3
    assert 3 not in per_doc  # empty doc contributes nothing
    # repeated token hashes identically: 'alpha' twice -> same cell,
    # so doc 1 occupies at most 3 distinct cells.
    assert feats.where("id = 1").count() <= 3


def test_same_token_same_cell_across_docs(spark):
    feats = hashed_features(_docs(spark), "text", 64).collect()
    # 'beta' appears in docs 1 and 2; find cells present in both docs
    # with compatible signs: dims of doc2's pure-beta contribution.
    d1 = {(r["dim"]): r["weight"] for r in feats if r["id"] == 1}
    d2 = {(r["dim"]): r["weight"] for r in feats if r["id"] == 2}
    shared = set(d1) & set(d2)
    assert shared  # beta's dim must be common
    # alpha/beta/gamma occupy at most 3 cells (hash collisions may
    # merge some — that's the hashing trick working as specified).
    assert 1 <= len(d1) <= 3


def test_profile_matches_features(spark):
    feats = hashed_features(_docs(spark), "text", 8)
    prof = hashed_corpus_profile(feats)
    assert prof.agg(F.sum("entries")).first()[0] == feats.count()
    tw = prof.agg(F.sum("total_weight")).first()[0]
    fw = feats.agg(F.sum("weight")).first()[0]
    assert tw == fw


def test_dims_validation(spark):
    with pytest.raises(ValueError):
        hashed_features(_docs(spark), "text", 1)
