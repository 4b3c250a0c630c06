"""Sign-LSH invariants (operators/rplsh.py): angle-monotone bit
agreement, near-duplicate collision, determinism, validation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.rplsh import (
    random_hyperplanes,
    rp_bands,
    rp_candidate_pairs,
    rp_signature_bits,
)


def _sig(spark, vec, bits=64, seed=7):
    planes = random_hyperplanes(len(vec), bits, seed=seed)
    df = spark.createDataFrame([(vec,)], "v array<double>")
    exprs = rp_signature_bits(F.col("v"), planes)
    row = df.select(*[e.alias(f"b{i}") for i, e in enumerate(exprs)]).first()
    return [row[f"b{i}"] for i in range(bits)]


def test_bit_agreement_tracks_angle(spark):
    """Charikar: P[bits agree] = 1 - θ/π — with 64 planes the
    agreement fraction should order strictly by angle."""
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.95, 0.05, 0.0, 0.0]            # tiny angle
    mid = [1.0, 1.0, 0.0, 0.0]               # 45°
    opposite = [-1.0, 0.0, 0.0, 0.0]         # 180°
    s_base = _sig(spark, base)
    agree = lambda s: sum(int(a == b) for a, b in zip(s_base, s)) / len(s_base)
    a_near, a_mid, a_opp = (
        agree(_sig(spark, near)),
        agree(_sig(spark, mid)),
        agree(_sig(spark, opposite)),
    )
    assert a_near > a_mid > a_opp
    assert a_near > 0.9
    assert a_opp == 0.0  # antipodal vectors flip EVERY sign
    assert a_mid == pytest.approx(1 - (math.pi / 4) / math.pi, abs=0.15)


def test_near_duplicates_always_candidate(spark):
    rows = [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [1.0001, 2.0001, 3.0, 4.0]),  # near-identical
        (3, [-4.0, 3.0, -2.0, 1.0]),      # orthogonal-ish
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r["id1"], r["id2"])
        for r in rp_candidate_pairs(df, bits=16, bands=4, seed=1).collect()
    }
    assert (1, 2) in pairs


def test_bands_deterministic_under_repartition(spark):
    rows = [(i, [float((i * 7 + d) % 13) - 6 for d in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = sorted(map(tuple, rp_bands(df, bits=16, bands=4).collect()))
    b = sorted(map(tuple, rp_bands(df.repartition(7), bits=16, bands=4).collect()))
    assert a == b
    assert len(a) == 40 * 4  # one key per (vector, band)


def test_validation(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="divide"):
        rp_bands(df, bits=16, bands=5)
    with pytest.raises(ValueError, match="dim"):
        random_hyperplanes(0, 4)
    with pytest.raises(ValueError, match="empty"):
        rp_bands(df.where(F.lit(False)))


def test_hamming_pairs_verify_candidates(spark):
    from k_means_using_mapreduce_spark.operators.rplsh import (
        rp_candidate_pairs,
        rp_hamming_pairs,
        rp_signatures,
    )

    rows = [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [1.0001, 2.0001, 3.0, 4.0]),
        (3, [-4.0, 3.0, -2.0, 1.0]),
        (4, [0.5, 1.0, 1.5, 2.0]),  # colinear with 1 -> identical signs
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in rp_hamming_pairs(
            df, bits=32, bands=4, seed=1, max_hamming=2
        ).collect()
    }
    assert out[(1, 2)] <= 2
    assert out[(1, 4)] == 0  # colinear: every sign identical
    # the verify only tightens the candidate set
    cand = {
        (r["id1"], r["id2"])
        for r in rp_candidate_pairs(df, bits=32, bands=4, seed=1).collect()
    }
    assert set(out) <= cand
    # signature packing: 32 sign bits round-trip through the long
    sigs = {r["id"]: r["sig"] for r in rp_signatures(df, bits=32, seed=1).collect()}
    assert sigs[1] == sigs[4] and sigs[1] != sigs[3]
    with pytest.raises(ValueError, match="62"):
        rp_signatures(df, bits=63)


def test_sign_kernel_bit_exact_vs_expression_fold(spark):
    """The vectorized sign kernel must agree with the dot_expr fold
    BIT-FOR-BIT (same per-dimension addition order), including vectors
    engineered to put dots very near zero."""
    import pyspark.sql.functions as F

    from k_means_using_mapreduce_spark.operators.rplsh import (
        _sign_bits_rows,
        random_hyperplanes,
        rp_signature_bits,
    )

    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) * 10 ** rng.randint(-12, 0) for _ in range(8)]) for i in range(300)]
    rows.append((998, None))
    rows.append((999, [1.0, 2.0]))  # wrong length
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = random_hyperplanes(8, 16, seed=3)

    kern = {
        r["id"]: r["bits"]
        for r in _sign_bits_rows(df, "vec_id", "embedding", planes).collect()
    }
    ok = df.where(F.size("embedding") == 8)
    exprs = rp_signature_bits(F.col("embedding").cast("array<double>"), planes)
    ref = {
        r["vec_id"]: [r[f"b{j}"] for j in range(16)]
        for r in ok.select(
            "vec_id", *[e.alias(f"b{j}") for j, e in enumerate(exprs)]
        ).collect()
    }
    for i, bits in ref.items():
        assert kern[i] == bits, f"bit mismatch at id {i}"
    assert kern[998] is None and kern[999] is None
