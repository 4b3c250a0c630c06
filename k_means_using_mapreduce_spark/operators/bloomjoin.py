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

Determinism & portability: bit positions are the house hash —
``int60(md5(key || ':' || i)) % num_bits`` — so a DuckDB oracle
reproduces membership (INCLUDING false positives) bit-for-bit, and
retries/repartitions cannot change the outcome. False positives are a
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


def bloom_bit_positions(
    key: Column, num_bits: int, num_hashes: int
) -> list[Column]:
    """The ``num_hashes`` bit positions of ``key`` — independent hashes
    via salt suffixes on one md5 family (``key || ':' || i``)."""
    k = key.cast("string")
    return [
        _int60(F.concat(k, F.lit(f":{i}"))) % num_bits
        for i in range(num_hashes)
    ]


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
        F.array(*bloom_bit_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("pos")
    words = (
        build.select(pos)
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
    (element_at + bit-and); array indexing is 1-based."""
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
    joined = probe.join(F.broadcast(bitmap))
    keep = bloom_might_contain(
        F.col(probe_key),
        F.col("words"),
        num_bits=num_bits,
        num_hashes=num_hashes,
    )
    return joined.filter(keep).drop("words", "num_bits", "num_hashes")
