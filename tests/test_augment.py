"""operators/augment.py: deterministic token dropout — coin exactness,
rate calibration, and retry/partitioning invariance."""

from __future__ import annotations

import hashlib

import pytest


def _coin(doc_id, pos_1based):
    h = hashlib.md5(f"{doc_id}:{pos_1based}".encode()).hexdigest()[:15]
    return int(h, 16) % 100


def test_token_dropout_matches_hand_coins_and_is_deterministic(spark):
    from k_means_using_mapreduce_spark.operators.augment import (
        token_dropout,
    )

    docs = spark.createDataFrame(
        [(1, "The quick Brown fox jumps over the lazy dog"),
         (2, "  "), (3, "one")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in token_dropout(docs, drop_pct=30).collect()}
    toks = "the quick brown fox jumps over the lazy dog".split()
    kept = [t for i, t in enumerate(toks, 1) if _coin(1, i) >= 30]
    assert out[1]["n_tokens"] == 9
    assert out[1]["n_kept"] == len(kept)
    expect_md5 = hashlib.md5(" ".join(kept).encode()).hexdigest()
    assert out[1]["aug_md5"] == expect_md5
    # whitespace-only text: zero tokens in and out
    assert out[2]["n_tokens"] == 0 and out[2]["n_kept"] == 0
    # re-run is bit-identical (hash coins, no rand)
    again = {r["doc_id"]: r for r in token_dropout(docs, drop_pct=30).collect()}
    assert out[1]["aug_md5"] == again[1]["aug_md5"]

    with pytest.raises(ValueError, match="drop_pct"):
        token_dropout(docs, drop_pct=0)


def test_dropout_summary_rate_calibrates(spark):
    from k_means_using_mapreduce_spark.operators.augment import (
        dropout_summary,
    )

    # 200 docs x 50 tokens: realized rate within 2 points of nominal
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(50))) for i in range(200)],
        "doc_id long, text string",
    )
    r = dropout_summary(docs, drop_pct=10).collect()[0]
    assert r["n_docs"] == 200
    assert r["tokens_before"] == 10000
    assert abs(r["drop_rate"] - 0.10) < 0.02
