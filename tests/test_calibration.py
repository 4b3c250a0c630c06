"""operators/calibration.py: bin law, PAV correctness vs a reference
implementation, monotonicity, application ladder."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.calibration import (
    binned_calibration,
    isotonic_apply,
    isotonic_fit,
)


def _pav_reference(pairs):
    """Exact PAV on (weight, rate) blocks — independent re-derivation."""
    blocks = []
    for w, r in pairs:
        blocks.append((w, r))
        while len(blocks) >= 2 and blocks[-2][1] > blocks[-1][1]:
            (w1, r1), (w2, r2) = blocks[-2], blocks[-1]
            blocks = blocks[:-2] + [
                (w1 + w2, (w1 * r1 + w2 * r2) / (w1 + w2))
            ]
        blocks = [
            (w, r) for w, r in blocks
        ]
    return blocks


def test_binned_calibration_equal_counts_and_rates(spark):
    rows = [(i, i / 100.0, 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, score double, label int")
    bins = binned_calibration(df, "score", "label", "id", n_bins=4).collect()
    by = {r["bin"]: r for r in bins}
    assert all(by[b]["n"] == 25 for b in range(1, 5))
    assert by[1]["pos_rate"] == 0.0 and by[4]["pos_rate"] == 1.0
    assert by[3]["pos_rate"] == 1.0  # bins 51-75 all positive
    assert by[1]["min_score"] == 0.0 and by[4]["max_score"] == 0.99


def test_isotonic_fit_matches_reference_pav(spark):
    rng = random.Random(4)
    # noisy increasing probability of label with score
    rows = [
        (i, s := rng.random(), 1 if rng.random() < 0.2 + 0.6 * s else 0)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, score double, label int")
    binned = binned_calibration(df, "score", "label", "id", n_bins=25)
    model = isotonic_fit(binned)
    # monotone non-decreasing calibrated probabilities
    ps = [p for _, p in model.steps]
    assert ps == sorted(ps)
    # equals reference PAV over the same bins
    bin_rows = sorted(binned.collect(), key=lambda r: r["bin"])
    ref = _pav_reference([(r["n"], r["pos_rate"]) for r in bin_rows])
    assert len(ref) == len(model.steps)
    for (_, rp), (_, mp) in zip(ref, model.steps):
        assert mp == pytest.approx(rp)


def test_isotonic_apply_ladder(spark):
    from k_means_using_mapreduce_spark.operators.calibration import (
        IsotonicModel,
    )

    model = IsotonicModel(steps=[(0.3, 0.1), (0.7, 0.5), (float("inf"), 0.9)])
    df = spark.createDataFrame(
        [(1, 0.0), (2, 0.3), (3, 0.5), (4, 0.71), (5, 100.0)],
        "id long, score double",
    )
    out = {r["id"]: r["calibrated_p"] for r in isotonic_apply(df, "score", model).collect()}
    assert out[1] == 0.1 and out[2] == 0.1  # <= bound inclusive
    assert out[3] == 0.5
    assert out[4] == 0.9 and out[5] == 0.9


def test_perfectly_monotone_data_is_identity_on_bins(spark):
    rows = [(i, float(i), 1 if i % 10 < i // 10 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, score double, label int")
    binned = binned_calibration(df, "score", "label", "id", n_bins=10)
    model = isotonic_fit(binned)
    rates = [r["pos_rate"] for r in sorted(binned.collect(), key=lambda r: r["bin"])]
    if rates == sorted(rates):  # already isotone -> PAV must not pool
        assert len(model.steps) == 10


def test_guards(spark):
    df = spark.createDataFrame([(1, 0.5, 1)], "id long, score double, label int")
    with pytest.raises(ValueError, match="n_bins"):
        binned_calibration(df, "score", "label", "id", n_bins=1)
    empty = spark.createDataFrame([], "bin int, n long, max_score double, pos_rate double")
    with pytest.raises(ValueError, match="empty"):
        isotonic_fit(empty)
