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


def test_quantile_normalize_aligns_shifted_groups(spark):
    from k_means_using_mapreduce_spark.operators.calibration import (
        quantile_normalize,
    )
    from pyspark.sql import functions as F

    # group b = group a + 100: same shape, shifted scale. After
    # normalization both groups map onto the SAME global quantiles.
    rows = [("a", float(i)) for i in range(50)]
    rows += [("b", float(i) + 100.0) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_normalize(df, "v", "g")
    stats = {
        r["g"]: r
        for r in out.groupBy("g")
        .agg(F.avg("qnorm").alias("m"), F.min("qnorm").alias("lo"),
             F.max("qnorm").alias("hi"))
        .collect()
    }
    # identical within-group ranks -> identical normalized columns
    assert stats["a"]["m"] == pytest.approx(stats["b"]["m"])
    assert stats["a"]["lo"] == pytest.approx(stats["b"]["lo"])
    assert stats["a"]["hi"] == pytest.approx(stats["b"]["hi"])
    # range spans the global distribution [min, max] = [0, 149]
    assert stats["a"]["lo"] == pytest.approx(0.0)
    assert stats["a"]["hi"] == pytest.approx(149.0)


def test_quantile_normalize_identity_single_group(spark):
    from k_means_using_mapreduce_spark.operators.calibration import (
        quantile_normalize,
    )

    # one group: percent_rank p maps back to the global quantile at p;
    # on a uniform grid that's the value itself (within interpolation)
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(101)], "g string, v double"
    )
    out = quantile_normalize(df, "v", "g").collect()
    for r in out:
        assert r["qnorm"] == pytest.approx(r["v"], abs=1e-9)


def test_quantile_normalize_guards(spark):
    from k_means_using_mapreduce_spark.operators.calibration import (
        quantile_normalize,
    )

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        quantile_normalize(df, "v", "g", grid=2)
    # single-row group: percent_rank 0 -> global minimum, not an error
    assert quantile_normalize(df, "v", "g").collect()[0][
        "qnorm"
    ] == pytest.approx(1.0)


def test_brier_decomposition_identity_and_extremes(spark):
    from k_means_using_mapreduce_spark.operators.calibration import (
        brier_decomposition,
    )

    # perfectly calibrated AND discriminating: scores 0/1 = labels
    rows = [(i, 0.0, 0.0) for i in range(50)] + [
        (i, 1.0, 1.0) for i in range(50, 100)
    ]
    df = spark.createDataFrame(rows, "id long, s double, y double")
    r = brier_decomposition(df, "s", "y", id_col="id", bins=2).collect()[0]
    assert r["base_rate"] == pytest.approx(0.5)
    assert r["reliability"] == pytest.approx(0.0, abs=1e-12)
    assert r["resolution"] == pytest.approx(0.25)
    assert r["uncertainty"] == pytest.approx(0.25)
    assert r["brier"] == pytest.approx(0.0, abs=1e-12)

    # constant useless score: no resolution, brier = uncertainty +
    # miscalibration of the constant
    flat = spark.createDataFrame(
        [(i, 0.5, float(i % 2)) for i in range(100)],
        "id long, s double, y double",
    )
    r2 = brier_decomposition(flat, "s", "y", id_col="id", bins=2).collect()[0]
    assert r2["resolution"] == pytest.approx(0.0, abs=1e-12)
    assert r2["brier"] == pytest.approx(0.25)
    import pytest as _p

    with _p.raises(ValueError):
        brier_decomposition(flat, "s", "y", bins=1)


class TestIsotonicExact:
    def _fit(self, spark, pairs, increasing=True):
        from k_means_using_mapreduce_spark.operators.calibration import (
            isotonic_exact,
        )

        df = spark.createDataFrame(pairs, "x double, y double")
        rows = isotonic_exact(df, "x", "y", increasing=increasing).collect()
        return {r["x"]: r for r in rows}

    def test_matches_hand_pava(self, spark):
        # classic violation: means 1, 3, 2 -> pool (3,2) to 2.5
        got = self._fit(spark, [(1.0, 1.0), (2.0, 3.0), (3.0, 2.0)])
        assert got[1.0]["y_iso"] == pytest.approx(1.0)
        assert got[2.0]["y_iso"] == pytest.approx(2.5)
        assert got[3.0]["y_iso"] == pytest.approx(2.5)

    def test_weighted_pooling(self, spark):
        # x=2 has weight 3 (mean 3), x=3 weight 1 (y 0): pooled mean
        # = (9 + 0) / 4 = 2.25
        pairs = [(1.0, 1.0), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0), (3.0, 0.0)]
        got = self._fit(spark, pairs)
        assert got[2.0]["n"] == 3
        assert got[2.0]["y_iso"] == pytest.approx(2.25)
        assert got[3.0]["y_iso"] == pytest.approx(2.25)

    def test_monotone_and_mean_preserving(self, spark):
        import random

        rng = random.Random(5)
        pairs = [(float(i % 13), rng.uniform(0, 10)) for i in range(200)]
        got = self._fit(spark, pairs)
        xs = sorted(got)
        isos = [got[x]["y_iso"] for x in xs]
        assert all(a <= b + 1e-12 for a, b in zip(isos, isos[1:]))
        # PAVA preserves the weighted mean
        tw = sum(got[x]["n"] for x in xs)
        assert sum(got[x]["y_iso"] * got[x]["n"] for x in xs) / tw == pytest.approx(
            sum(got[x]["y_mean"] * got[x]["n"] for x in xs) / tw
        )

    def test_decreasing(self, spark):
        got = self._fit(
            spark, [(1.0, 5.0), (2.0, 1.0), (3.0, 2.0)], increasing=False
        )
        isos = [got[x]["y_iso"] for x in sorted(got)]
        assert all(a >= b - 1e-12 for a, b in zip(isos, isos[1:]))
        assert isos[0] == pytest.approx(5.0)
        assert isos[1] == pytest.approx(1.5)
