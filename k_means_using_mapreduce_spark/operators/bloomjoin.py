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

Determinism & portability: bit positions are Kirsch–Mitzenmacher
double hashing from ONE md5 per key — two independent 60-bit bases
``h1 = int60(md5(key)[1:15])``, ``h2 = int60(md5(key)[16:30]) mod 2⁵⁷``
fanned to ``posᵢ = (h1 + i·h2) mod num_bits`` (exact int64 in both
engines: i ≤ 32 keeps i·h2 < 2⁶², no ANSI overflow), so a DuckDB
oracle reproduces membership (INCLUDING false positives) bit-for-bit,
retries/repartitions cannot change the outcome, and the probe scan
pays one md5 per row. The round-5 single-base design had a hard
false-positive FLOOR of ~n/2³¹ (any two keys colliding in the one
``mod (2³¹−1)`` base shared every position, no matter how large the
bitmap) — several percent at 10⁸⁺ build keys; with two independent
bases the pair-collision floor drops to ~n/2¹¹⁷, i.e. gone. False
positives remain a documented property of the operator, not an error:
the output is a SUPERSET of the exact semi-join, to be finished by an
exact join or accepted as-is (cache admission, candidate pruning).

Sizing: ``num_bits ≈ -n·ln(fpp)/ln(2)²`` and ``num_hashes ≈
(num_bits/n)·ln(2)`` (`suggest_params`, clamped to
``MAX_BLOOM_HASHES``). The filter degrades gracefully — an undersized
bitmap saturates toward "pass everything", never drops a true match.

Reference parity: the reference engine has no join operators at all
(SURVEY.md §2, "categories with NO implementation"); this family is
part of the LLM-data-pipeline surface the rebuild adds on top.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: Kirsch–Mitzenmacher fan-out cap: i·h2 with h2 < 2^57 and i ≤ 32
#: stays < 2^62, so position arithmetic never overflows int64 (Spark
#: runs ANSI — overflow would be an error, not a wrap). 32 hashes
#: covers every practical sizing (k ≈ 0.7·bits/key; k = 32 is already
#: a ~2e-10 fpp design).
MAX_BLOOM_HASHES = 32

#: h2 is reduced mod 2^57 to bound the i·h2 product (see above).
_H2_MOD = 1 << 57


def _int60(c: Column, start: int = 1) -> Column:
    """House hash: 15 hex chars of md5 from ``start`` as a
    non-negative int60. DuckDB twin:
    ``('0x' || substr(md5(x), start, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(c), start, 15), 16, 10).cast("long")


def bloom_base_hashes(key: Column) -> tuple[Column, Column]:
    """The two independent Kirsch–Mitzenmacher bases from ONE md5 per
    key: ``h1`` = hex chars 1–15 (int60), ``h2`` = hex chars 16–30
    (int60) mod 2⁵⁷. Independence of the two bases is what removes
    the single-base design's n/2³¹ false-positive floor."""
    s = key.cast("string")
    return _int60(s, 1), _int60(s, 16) % F.lit(_H2_MOD)


def bloom_positions_from_base(
    h1: Column, h2: Column, num_bits: int, num_hashes: int
) -> list[Column]:
    """``num_hashes`` bit positions ``(h1 + i·h2) mod num_bits`` —
    exact int64 (i·h2 < 2⁶²), engine-portable."""
    if num_hashes > MAX_BLOOM_HASHES:
        raise ValueError(
            f"num_hashes={num_hashes} exceeds MAX_BLOOM_HASHES="
            f"{MAX_BLOOM_HASHES} (int64-overflow-safe fan-out bound)"
        )
    return [
        (h1 + F.lit(i) * h2) % num_bits for i in range(num_hashes)
    ]


def bloom_bit_positions(
    key: Column, num_bits: int, num_hashes: int
) -> list[Column]:
    """The ``num_hashes`` bit positions of ``key`` (base hashes
    inlined; prefer projecting :func:`bloom_base_hashes` once when the
    key column is reused, as bloom_semi_join does)."""
    h1, h2 = bloom_base_hashes(key)
    return bloom_positions_from_base(h1, h2, num_bits, num_hashes)


def suggest_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(num_bits, num_hashes) for a target false-positive rate, rounded
    up to whole words; ``num_hashes`` is clamped to
    ``MAX_BLOOM_HASHES`` so the suggestion is always buildable.

    The rate is the standard Bloom formula — with the K–M double-hash
    positions the residual floor from base-hash pair collisions is
    ~n/2¹¹⁷, irrelevant at any real n (the round-5 single-base scheme
    had an n/2³¹ floor that dominated the formula at 10⁸⁺ keys)."""
    if expected_items <= 0:
        raise ValueError(f"expected_items must be > 0, got {expected_items}")
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = -expected_items * math.log(fpp) / (math.log(2) ** 2)
    num_bits = max(64, int(math.ceil(m / 64.0)) * 64)
    num_hashes = max(1, round(num_bits / expected_items * math.log(2)))
    return num_bits, min(num_hashes, MAX_BLOOM_HASHES)


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
            *bloom_positions_from_base(
                F.col("_b1"), F.col("_b2"), num_bits, num_hashes
            )
        )
    ).alias("pos")
    h1, h2 = bloom_base_hashes(F.col(key_col))
    words = (
        build.select(h1.alias("_b1"), h2.alias("_b2"))
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
    (element_at + bit-and); array indexing is 1-based. Callers reusing
    the key column should project :func:`bloom_base_hashes` once and
    use bloom_positions_from_base (as bloom_semi_join does); here the
    bases are inlined per position expression (codegen CSEs the
    shared md5)."""
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
    h1, h2 = bloom_base_hashes(F.col(probe_key))
    joined = (
        probe.withColumn("_b1", h1)
        .withColumn("_b2", h2)
        .join(F.broadcast(bitmap))
    )
    conds = []
    for p in bloom_positions_from_base(
        F.col("_b1"), F.col("_b2"), num_bits, num_hashes
    ):
        word = F.element_at(F.col("words"), (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        conds.append(word.bitwiseAND(bit) != 0)
    keep = reduce(lambda a, b: a & b, conds)
    return joined.filter(keep).drop(
        "_b1", "_b2", "words", "num_bits", "num_hashes"
    )
