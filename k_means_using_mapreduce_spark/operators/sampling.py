"""Deterministic hash-based sampling and dataset splitting.

A training-data pipeline needs samples and train/test splits that are
(a) reproducible run-to-run, (b) stable under Spark task retries and
repartitioning, and (c) consistent across engines. `F.rand()`-based
sampling (and `df.sample`) violates (b): a retried task re-draws its
randomness against a different row order, so a failed-and-recomputed
partition can emit a *different* sample — at 100 TB with thousands of
task retries per job, rand-sampled output is not deterministic.

Hash bucketing fixes all three: bucket = md5(key) mod n is a pure
per-row function of the data. md5 is the one hash Spark and DuckDB
compute identically (lowercase hex; see contracts/_sql_text.py
conventions), so the same expression doubles as the DuckDB oracle —
`conv(substr(md5(x),1,15),16,10)` ≡ `('0x' || substr(md5(x),1,15))::BIGINT`.

Scale: pure map-side projection/filter — zero shuffle, pushes the
filter below everything Catalyst can move it through; sampled scans
read full row groups but decode only selected rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, n_buckets: int) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the key.

    Uses the first 15 hex chars (60 bits) — fits a signed int64, and
    uniform enough that bucket skew is < 0.1% at any realistic n.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    return (h % F.lit(n_buckets)).alias("bucket")


def hash_sample(
    df: DataFrame, key: str, *, keep: int, out_of: int = 100
) -> DataFrame:
    """Keep the deterministic ``keep/out_of`` fraction of rows by key
    hash (e.g. ``keep=10, out_of=100`` ≈ 10%). The same key always
    lands in the same bucket, so samples are consistent across tables
    sharing the key (a join of two 10% samples on the same key is a
    10% sample of the join, not 1%)."""
    if not 0 < keep <= out_of:
        raise ValueError(f"need 0 < keep <= out_of, got {keep}/{out_of}")
    return df.where(hash_bucket(key, out_of) < F.lit(keep))


def train_test_split(
    df: DataFrame, key: str, *, test_pct: int = 10, col_name: str = "split"
) -> DataFrame:
    """Label each row 'train'/'test' by key hash — a disjoint, exhaustive,
    deterministic partition (every key always gets the same label, in
    every run, on every cluster size)."""
    if not 0 < test_pct < 100:
        raise ValueError(f"test_pct must be in (0, 100), got {test_pct}")
    return df.withColumn(
        col_name,
        F.when(hash_bucket(key, 100) < F.lit(test_pct), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    rates: dict[str, int],
    *,
    default_keep: int = 0,
    out_of: int = 100,
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep rates (e.g.
    downsample a dominant crawl source to 10% while keeping 100% of a
    rare curated source — the canonical training-data-mixture op).

    ``rates`` maps stratum value → keep (out of ``out_of``); unlisted
    strata use ``default_keep`` (0 = drop). Selection is by md5 bucket
    of ``key``, so it is retry/repartition-stable, engine-portable, and
    consistent with :func:`hash_sample` (a stratum at rate r keeps
    exactly the rows hash_sample(keep=r) would keep).

    Same scale shape as hash_sample: a pure map-side filter, no
    shuffle; the per-stratum thresholds compile to one CASE expression.
    """
    for stratum, keep in rates.items():
        if not 0 <= keep <= out_of:
            raise ValueError(f"rate for {stratum!r} out of range: {keep}/{out_of}")
    if not 0 <= default_keep <= out_of:
        raise ValueError(f"default_keep out of range: {default_keep}/{out_of}")
    threshold = F.lit(default_keep)
    for stratum, keep in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(keep)
        ).otherwise(threshold)
    return df.where(hash_bucket(key, out_of) < threshold)


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    key: str,
    weight_col: str,
    *,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, ``k`` rows per group, by
    the Efraimidis-Spirakis exponential race (A-ES, 2006): each row
    draws priority ``ln(u) / w`` from a deterministic uniform
    ``u = (md5_int60(key) + 1) / 2^60`` in (0, 1], and the k largest
    priorities per group win. The selection probability is exactly
    proportional to ``w`` at each of the k draws — the distributed
    formulation of weighted reservoir sampling, with the reservoir
    replaced by a top-k window.

    Training-data use: sample documents per source proportional to a
    quality score, so the mixture favors high-quality text without
    hard-filtering the tail.

    Determinism: ``u`` comes from md5 of ``key`` (not rand), so the
    draw is retry/repartition-stable and engine-portable like every
    sampler in this module; ties break by ``key`` and then by an md5
    of the full row content, so even duplicate key values within a
    group select a deterministic multiset (duplicate FULL rows are
    interchangeable, so any pick is value-identical). The A-ES
    proportional-probability guarantee itself assumes ``key`` is
    unique per group — duplicate keys share one draw and are
    effectively a single candidate with the first copy's weight.
    Rows with NULL or non-positive weight are excluded (A-ES gives
    them zero win probability; excluding them is the defined
    behavior, not an accident of log-domain math).

    Scale: one shuffle keyed by group for the top-k window — same
    shape and same hot-group caveat as :func:`cap_per_group`.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 15), 16, 10
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    w_col = F.col(weight_col).cast("double")
    priority = F.log(u) / w_col
    # priority is a pure function of key, so duplicate keys in a group
    # tie on (priority, key); the content hash makes row_number's pick
    # partition-order-independent (exact duplicates remain ties, but
    # then every resolution is the same multiset).
    content = F.md5(F.to_json(F.struct(*df.columns)))
    win = Window.partitionBy(group_col).orderBy(
        F.col("_aes_priority").desc(), F.col(key), F.col("_aes_tb")
    )
    return (
        df.where(w_col.isNotNull() & (w_col > 0))
        .withColumn("_aes_priority", priority)
        .withColumn("_aes_tb", content)
        .withColumn("_aes_rk", F.row_number().over(win))
        .where(F.col("_aes_rk") <= k)
        .drop("_aes_priority", "_aes_tb", "_aes_rk")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key: str,
    *,
    n: int,
) -> DataFrame:
    """Keep at most ``n`` rows per ``group_col`` value, chosen by md5
    hash order of ``key`` (ties broken by the key itself).

    The per-domain cap every crawl pipeline applies: no single domain
    may contribute more than n documents. Hash order makes the kept set
    a deterministic pseudo-random sample — independent of input order,
    partitioning, and retries, unlike rand()-ordered row_number.

    Scale: one shuffle keyed by group for the row_number window. A
    pathologically hot group serializes through one task; if one group
    holds a double-digit share of ALL rows, hash_sample that group down
    to ~10·n/|group| first and cap the sample. The kept set then comes
    from the sampled bucket range instead of the global n-smallest
    hashes — a DIFFERENT but still fully deterministic selection, which
    is what matters for a cap (any unbiased deterministic n suffice).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyspark.sql.window import Window

    order_h = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy(group_col).orderBy(order_h, F.col(key))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n)
        .drop("_rk")
    )


def hash_ring_negatives(
    df: DataFrame,
    id_col: str,
    *,
    k: int,
    salt: str = "ring",
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive /
    retrieval training: arrange ids on a ring ordered by their salted
    house hash and give each id the next ``k`` ids as negatives —
    ``(id, slot, neg_id)``, slot 1..k.

    Why a hash ring beats rand(): every id gets EXACTLY k negatives,
    the draw is uniform w.r.t. content (hash order is independent of
    any attribute), collisions/self-pairs are impossible, and retries,
    repartitions, and the SQL oracle reproduce the pairing exactly —
    the engine's determinism doctrine applied to negative mining.
    Epoch re-draws: change ``salt`` (ring order reshuffles wholesale).

    Shape: one rank over the hash order (single-reducer window at rank
    time — the sorted-neighborhood precedent; switch to zipWithIndex
    over a range-partitioned sort at extreme scale) and one equi-join
    on ring position with modular wrap-around — never a cartesian.

    Requires ``k < count(DISTINCT ids)``: with k ≥ the ring size the
    modular wrap would revisit the id itself (a self-pair the filter
    would silently drop, breaking the exactly-k guarantee) and repeat
    neighbors; validated eagerly (one count job) rather than noted.
    The ring is built over DISTINCT ids — duplicate input rows would
    otherwise occupy adjacent ring slots and hand every id its own
    duplicate as a "negative" (ADVICE r5: the guard must measure the
    actual ring, not the row count).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    df = df.select(id_col).distinct()
    n_ids = df.count()
    if k >= n_ids:
        raise ValueError(
            f"k={k} must be < the number of distinct ids on the ring "
            f"({n_ids}): the modular wrap would produce self-pairs and "
            "duplicate negatives"
        )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.orderBy(h, F.col(id_col))
    ranked = df.select(
        F.col(id_col).alias("_id"), F.row_number().over(w).alias("_rn")
    )
    total = ranked.agg(F.count("*").alias("_n"))
    slots = F.explode(
        F.array(*[F.lit(i) for i in range(1, k + 1)])
    ).alias("slot")
    left = (
        ranked.join(F.broadcast(total))
        .select("_id", "_rn", "_n", slots)
        .select(
            F.col("_id").alias("id"),
            "slot",
            ((F.col("_rn") + F.col("slot") - 1) % F.col("_n") + 1).alias(
                "_rn_b"
            ),
        )
    )
    right = ranked.select(
        F.col("_id").alias("neg_id"), F.col("_rn").alias("_rn_b")
    )
    out = left.join(right, "_rn_b").select("id", "slot", "neg_id")
    return out.where(F.col("id") != F.col("neg_id"))


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    *,
    total_n: int,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation — the DESIGN step
    in front of :func:`stratified_sample`: given a budget of
    ``total_n`` rows, variance-minimizing stratum sizes are

        n_h = total_n · N_h·S_h / Σ_h N_h·S_h

    (Neyman 1934): big strata get more, VARIABLE strata get more, and
    a stratum with zero variance needs almost nothing regardless of
    size. Reported next to proportional allocation (n·N_h/N) so the
    design gain is visible.

    Allocations stay FRACTIONAL doubles — integer rounding is the
    caller's policy decision (largest-remainder, ceil-min-1, …), and
    rounding inside the operator would hash-gate a tie.

    Returns one row per stratum: ``(stratum, n_rows, stddev,
    alloc_neyman, alloc_proportional)``, single-member or constant
    strata contributing stddev 0.

    Scale shape: one map-side-combinable groupBy over the stratum key
    computing (n, Σv, Σv²), stddev derived from the sums, and the
    normalizing constants joined back broadcast — two scans of
    nothing wider than |strata| rows after the first reduce.
    """
    if total_n < 1:
        raise ValueError(f"total_n must be >= 1, got {total_n}")
    v = F.col(value_col).cast("double")
    per = (
        df.where(v.isNotNull() & F.col(stratum_col).isNotNull())
        .groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            F.sum(v).alias("_s"),
            F.sum(v * v).alias("_ss"),
        )
        .withColumn(
            "stddev",
            F.when(
                F.col("_n") > 1.0,
                F.sqrt(
                    F.greatest(
                        (
                            F.col("_ss")
                            - F.col("_s") * F.col("_s") / F.col("_n")
                        )
                        / (F.col("_n") - 1.0),
                        F.lit(0.0),
                    )
                ),
            ).otherwise(F.lit(0.0)),
        )
    )
    tot = per.agg(
        F.sum(F.col("_n") * F.col("stddev")).alias("_ns"),
        F.sum("_n").alias("_nn"),
    )
    t = F.lit(float(total_n))
    return per.crossJoin(F.broadcast(tot)).select(
        "stratum",
        F.col("_n").cast("long").alias("n_rows"),
        "stddev",
        F.when(
            F.col("_ns") > 0.0,
            t * (F.col("_n") * F.col("stddev")) / F.col("_ns"),
        )
        .otherwise(t * F.col("_n") / F.col("_nn"))
        .alias("alloc_neyman"),
        (t * F.col("_n") / F.col("_nn")).alias("alloc_proportional"),
    )
