"""operators/tsmatch.py: planted-pattern recovery, z-invariance,
constant-window exclusion, window semantics."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark.operators.tsmatch import (
    sliding_windows,
    subsequence_topk,
    znormalize_pattern,
)


def _series(spark, values, key="k"):
    rows = [(key, i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, t long, v double")


def test_planted_burst_found_first(spark):
    # flat noise-free series with one burst at t=10
    vals = [1.0] * 10 + [9.0] + [1.0] * 10
    # window [1,1,9,1,1] starting at t=8 matches the burst shape EXACTLY
    df = _series(spark, vals)
    top = subsequence_topk(
        df, [0, 0, 1, 0, 0], "k", "t", "v", k=3
    ).collect()
    assert top[0]["start"] == 8
    assert top[0]["dist"] == pytest.approx(0.0)


def test_amplitude_and_offset_invariance(spark):
    # same shape at wildly different scales scores identically
    a = _series(spark, [0, 0, 5, 0, 0], key="small")
    b = _series(spark, [100, 100, 10000, 100, 100], key="big")
    top = subsequence_topk(
        a.unionAll(b), [0, 0, 1, 0, 0], "k", "t", "v", k=2
    ).collect()
    assert {r["k"] for r in top} == {"small", "big"}
    assert top[0]["dist"] == top[1]["dist"] == pytest.approx(0.0)


def test_constant_windows_excluded(spark):
    df = _series(spark, [3.0] * 12)
    assert subsequence_topk(df, [0, 0, 1, 0, 0], "k", "t", "v", k=5).count() == 0


def test_sliding_windows_shape(spark):
    df = _series(spark, [1, 2, 3, 4])
    wins = {
        r["start"]: r["window"]
        for r in sliding_windows(df, "k", "t", "v", length=3).collect()
    }
    assert wins == {0: [1.0, 2.0, 3.0], 1: [2.0, 3.0, 4.0]}


def test_validation(spark):
    df = _series(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        znormalize_pattern([2, 2, 2])
    with pytest.raises(ValueError):
        subsequence_topk(df, [0, 1, 0], "k", "t", "v", k=0)
    with pytest.raises(ValueError):
        sliding_windows(df, "k", "t", "v", length=1)


def test_motif_finds_planted_repeat(spark):
    from k_means_using_mapreduce_spark.operators.tsmatch import motif_pairs

    # same shape planted twice, far apart, in otherwise rising noise
    shape = [1.0, 5.0, 1.0, 5.0, 1.0]
    vals = shape + [float(10 + i) for i in range(10)] + shape
    df = _series(spark, vals)
    top = motif_pairs(
        df, "k", "t", "v", length=5, k=1, min_separation=5
    ).first()
    assert (top["start_a"], top["start_b"]) == (0, 15)
    assert top["dist"] == pytest.approx(0.0)


def test_motif_trivial_matches_excluded(spark):
    from k_means_using_mapreduce_spark.operators.tsmatch import motif_pairs

    # periodic series: adjacent overlapping windows match trivially;
    # min_separation forces the discovered pair to be >= 4 apart
    vals = [1.0, 9.0] * 10
    df = _series(spark, vals)
    out = motif_pairs(df, "k", "t", "v", length=4, k=3, min_separation=4)
    for r in out.collect():
        assert r["start_b"] - r["start_a"] >= 4


def test_motif_validation(spark):
    from k_means_using_mapreduce_spark.operators.tsmatch import motif_pairs

    df = _series(spark, [1, 2, 3, 4, 5, 6])
    import pytest as _pt

    with _pt.raises(ValueError):
        motif_pairs(df, "k", "t", "v", length=3, k=0)
    with _pt.raises(ValueError):
        motif_pairs(df, "k", "t", "v", length=3, max_bucket=1)
