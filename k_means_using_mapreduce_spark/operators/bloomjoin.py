"""Broadcast Bloom-filter semi-join: pre-filter a huge probe table
against a large build-side key set BEFORE any shuffle.

The scale problem this solves: a semi-join whose build side is too big
to broadcast as raw keys (100M order keys ≈ GBs with overhead) forces a
full shuffle of the 100 TB probe side. A Bloom filter of those same
keys at 10 bits/key is ~125 MB — broadcastable — and eliminates the
non-matching majority of the probe AT THE SCAN, so the (still exact)
shuffle join that follows only moves candidate rows. This is the
manual, deterministic twin of Spark's own runtime-filter injection
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed as an
operator so pipelines can apply it across stages/jobs where the
optimizer cannot see the relationship (e.g. the build set is computed
in a previous job and persisted).

Everything is JVM-side expression algebra (md5/conv/shift/bit-and in
whole-stage codegen) — no UDF, no driver-side bitset. The bitmap lives
in ONE DataFrame row as ``array<long>`` words and reaches the probe
via a broadcast nested-loop join of a 1-row relation (a plain literal
would re-serialize the array into every task binding anyway; the
broadcast relation ships it once per executor).

Determinism & portability: bit positions are ONE house hash per key —
``x = int60(md5(key)) mod P`` (P = 2³¹−1) — fanned to ``num_hashes``
positions by the frozen affine family ``(aᵢ·x + bᵢ) mod P mod
num_bits`` (operators/dedup.py::MINHASH_AFFINE — exact int64 in both
engines), so a DuckDB oracle reproduces membership (INCLUDING false
positives) bit-for-bit, retries/repartitions cannot change the
outcome, and the probe scan pays one md5 per row instead of
``num_hashes`` (the round-4 bench cost of this family). False positives are a
documented property of the operator, not an error: the output is a
SUPERSET of the exact semi-join, to be finished by an exact join or
accepted as-is (cache admission, candidate pruning).

Sizing: ``num_bits ≈ -n·ln(fpp)/ln(2)²`` and ``num_hashes ≈
(num_bits/n)·ln(2)`` (`suggest_params`). The filter degrades gracefully
— an undersized bitmap saturates toward "pass everything", never drops
a true match.

Reference parity: the reference engine has no join operators at all
(SURVEY.md §2, "categories with NO implementation"); this family is
part of the LLM-data-pipeline surface the rebuild adds on top.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _int60(c: Column) -> Column:
    """House hash: first 15 hex chars of md5 as a non-negative int60.
    DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def bloom_base_hash(key: Column) -> Column:
    """One md5 per key: ``int60(md5(key)) mod P`` — the base the
    affine position family mixes from."""
    from .dedup import MINHASH_P

    return _int60(key.cast("string")) % MINHASH_P


def bloom_positions_from_base(
    base: Column, num_bits: int, num_hashes: int
) -> list[Column]:
    """``num_hashes`` bit positions from one base hash via the frozen
    affine family — exact int64 (a·x < 2⁶²), engine-portable."""
    from .dedup import MINHASH_AFFINE, MINHASH_P

    if num_hashes > len(MINHASH_AFFINE):
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the {len(MINHASH_AFFINE)} "
            "frozen affine constants"
        )
    return [
        ((F.lit(a) * base + F.lit(b)) % MINHASH_P) % num_bits
        for a, b in MINHASH_AFFINE[:num_hashes]
    ]


def bloom_bit_positions(
    key: Column, num_bits: int, num_hashes: int
) -> list[Column]:
    """The ``num_hashes`` bit positions of ``key`` (base hash inlined;
    prefer projecting :func:`bloom_base_hash` once when the key column
    is reused, as bloom_semi_join does)."""
    return bloom_positions_from_base(
        bloom_base_hash(key), num_bits, num_hashes
    )


def suggest_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(num_bits, num_hashes) for a target false-positive rate, rounded
    up to whole words."""
    if expected_items <= 0:
        raise ValueError(f"expected_items must be > 0, got {expected_items}")
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = -expected_items * math.log(fpp) / (math.log(2) ** 2)
    num_bits = max(64, int(math.ceil(m / 64.0)) * 64)
    num_hashes = max(1, round(num_bits / expected_items * math.log(2)))
    return num_bits, num_hashes


def build_bloom_bitmap(
    build: DataFrame,
    key_col: str,
    *,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """ONE-row DataFrame ``(words array<long>, num_bits int, num_hashes
    int)`` — the Bloom bitmap of ``build[key_col]``, dense (missing
    words zero-filled) so probes index it by position.

    Distributed build: explode to (row × num_hashes) bit positions,
    partial-aggregate ``bit_or`` per 64-bit word (map-side combine
    reduces each partition to ≤ num_bits/64 rows before the shuffle),
    then assemble the dense array in a single final reduce. Nothing
    driver-side; the build side is never collected.
    """
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    n_words = num_bits // 64
    pos = F.explode(
        F.array(
            *bloom_positions_from_base(F.col("_bh"), num_bits, num_hashes)
        )
    ).alias("pos")
    words = (
        build.select(bloom_base_hash(F.col(key_col)).alias("_bh"))
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.try_element_at(F.col("m"), i), F.lit(0).cast("long")
            ),
        ).alias("words"),
        F.lit(num_bits).alias("num_bits"),
        F.lit(num_hashes).alias("num_hashes"),
    )


def bloom_might_contain(
    key: Column, words_col: Column, *, num_bits: int, num_hashes: int
) -> Column:
    """Membership predicate: all ``num_hashes`` bits set. Pure codegen
    (element_at + bit-and); array indexing is 1-based. ``key`` may be
    a pre-projected :func:`bloom_base_hash` column passed through
    bloom_positions_from_base by the caller; here it is hashed once
    per position expression (codegen CSEs the shared md5)."""
    conds = []
    for p in bloom_bit_positions(key, num_bits, num_hashes):
        word = F.element_at(words_col, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        conds.append(word.bitwiseAND(bit) != 0)
    return reduce(lambda a, b: a & b, conds)


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    *,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Filter ``probe`` to rows whose key MIGHT be in ``build`` — a
    superset of the exact left-semi join (false positives possible at
    the configured rate, false negatives never). Plan shape: the probe
    side has ZERO shuffle exchanges — the bitmap arrives by broadcast
    and the membership test runs inside the probe's scan stage
    (plan-asserted in tests/test_plans.py)."""
    bitmap = build_bloom_bitmap(
        build, build_key, num_bits=num_bits, num_hashes=num_hashes
    )
    joined = probe.withColumn(
        "_bh", bloom_base_hash(F.col(probe_key))
    ).join(F.broadcast(bitmap))
    conds = []
    for p in bloom_positions_from_base(F.col("_bh"), num_bits, num_hashes):
        word = F.element_at(F.col("words"), (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        conds.append(word.bitwiseAND(bit) != 0)
    keep = reduce(lambda a, b: a & b, conds)
    return joined.filter(keep).drop(
        "_bh", "words", "num_bits", "num_hashes"
    )
