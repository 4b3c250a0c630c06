"""Skew-handling operators: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one viral document source, one
dominant cluster id) can pin a whole stage on one reducer. Spark's AQE
skew-join splitting (enabled in session.py) handles *join* skew at
runtime; these helpers cover the remaining cases:

- ``salted_aggregate``: two-phase aggregation for algebraic aggregates
  over heavily skewed group keys. Phase 1 groups on (key, salt) so the
  hot key's rows spread over ``buckets`` reducers; phase 2 merges the
  per-salt partials. For sum/count/min/max the merge is the same
  function; avg is decomposed into sum+count. (Spark's own partial
  aggregation already does this when upstream partitions are balanced —
  salting matters when the *input partitioning itself* is keyed and
  skewed, e.g. after a keyed shuffle or from a bucketed source.)
- ``salted_broadcast_left``: replicate a small dimension ``buckets``
  times so a skewed fact side joins against (key, salt) — the classic
  salting pattern when the small side is too big to broadcast outright
  but the key histogram is too skewed for sort-merge.
- ``skew_report`` / ``heavy_keys``: the diagnostics that decide
  whether salting is needed at all and with how many buckets —
  measure first, then mitigate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    sums: Sequence[str] = (),
    counts: bool = True,
    buckets: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Two-phase skew-safe aggregation: per-key COUNT and SUMs.

    Returns one row per key with ``n`` and ``sum_<col>`` columns —
    exactly equal to the direct ``groupBy(key)`` result (addition is
    the merge function), but no reducer ever sees more than ~1/buckets
    of a hot key's rows in phase 1.
    """
    if not counts and not sums:
        raise ValueError(
            "salted_aggregate needs counts=True or at least one sums column"
        )
    # Content-hash salt (NOT F.rand): a recomputed partition re-derives
    # the SAME salt, so stage retries are reproducible — the same
    # determinism doctrine as sampling.py. The hash covers ALL input
    # columns, not just the grouped/summed ones: a counts-only call
    # salted on key columns alone would give every row of a hot key the
    # SAME salt — phase 1 re-concentrates on one reducer and the whole
    # mitigation silently no-ops. Rows identical in every column still
    # share a bucket, which affects balance only, never correctness.
    salt = F.pmod(
        F.hash(F.lit(seed), *[F.col(c) for c in df.columns]),
        F.lit(buckets),
    ).alias("_salt")
    phase1_aggs = [F.count("*").alias("_n")] + [
        F.sum(c).alias(f"_sum_{c}") for c in sums
    ]
    partial = (
        df.select(*key_cols, salt, *sums)
        .groupBy(*key_cols, "_salt")
        .agg(*phase1_aggs)
    )
    final_aggs = []
    if counts:
        final_aggs.append(F.sum("_n").alias("n"))
    final_aggs += [F.sum(f"_sum_{c}").alias(f"sum_{c}") for c in sums]
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    buckets: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Skew-safe equi-join: the fact side gets a content-derived salt in
    [0, buckets) (retry-stable — see :func:`salted_aggregate`); the dim
    side is replicated once per salt value; the join key becomes
    (key, salt). Row multiplicity matches the plain join exactly."""
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(
            F.hash(F.lit(seed), *[F.col(c) for c in fact.columns]),
            F.lit(buckets),
        ).cast("int"),
    )
    replicated_dim = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(buckets).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = salted_fact.join(replicated_dim, [key, "_salt"]).drop("_salt")
    return out


def heavy_keys(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    top: int = 10,
) -> DataFrame:
    """The ``top`` heaviest group keys: ``(keys..., n, share)``,
    ordered count-desc then keys-asc (deterministic under count
    ties). One aggregate shuffle; the order-by runs on the already
    aggregated |keys| rows and the limit prunes it to ``top``."""
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    total = df.count()
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    return (
        counts.select(
            *key_cols, "n", (F.col("n") / F.lit(float(total))).alias("share")
        )
        .orderBy(F.desc("n"), *[F.asc(c) for c in key_cols])
        .limit(top)
    )


def skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """One-row key-distribution report for a prospective shuffle key:

    ``(n_keys, total_rows, max_key_n, p50_key_n, p99_key_n,
    top1_share, skew_factor, recommended_buckets)``

    ``skew_factor = max/p50`` of per-key counts: ~1 means uniform (no
    mitigation), large means the biggest key holds a p50-reducer's
    workload many times over. ``recommended_buckets`` =
    ``ceil(skew_factor)`` capped at 64 — the salt count that levels
    the hottest key down to median-grade work
    (:func:`salted_aggregate`'s ``buckets``). Exact percentiles over
    the |keys|-row count table (the raw data aggregates first);
    switch to percentile_approx at billion-key scale.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    return counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("total_rows"),
        F.max("n").alias("max_key_n"),
        F.expr("percentile(n, 0.5)").alias("p50_key_n"),
        F.expr("percentile(n, 0.99)").alias("p99_key_n"),
        (F.max("n") / F.sum("n")).alias("top1_share"),
        (F.max("n") / F.expr("percentile(n, 0.5)")).alias("skew_factor"),
        F.least(
            F.lit(64),
            F.ceil(F.max("n") / F.expr("percentile(n, 0.5)")),
        ).alias("recommended_buckets"),
    )


def join_plan_advice(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    broadcast_row_limit: int = 1_000_000,
    skew_threshold: float = 8.0,
) -> DataFrame:
    """One-row join-strategy recommendation from measured statistics —
    the decision the diagnostics exist to feed:

    ``(fact_rows, dim_rows, fact_keys, max_key_n, p50_key_n,
    skew_factor, strategy, salt_buckets)``

    - ``dim_rows <= broadcast_row_limit`` → ``'broadcast'`` (skew on
      the fact side is irrelevant when nothing shuffles by key).
    - otherwise skewed fact key (``max/p50 > skew_threshold``) →
      ``'salted_shuffle'`` with ``salt_buckets = ceil(skew_factor)``
      capped at 64 (:func:`salted_aggregate`'s knob).
    - otherwise → ``'shuffle'`` (plain sort-merge/hash is fine).

    ``salt_buckets`` is 0 whenever salting is not the recommendation
    (kept non-nullable: a NULL numeric round-trips as NaN through
    pandas and breaks value comparison against engines that keep the
    NULL).

    Row counts here are EXACT (two count jobs + the per-key
    aggregate); swap in sketch estimates
    (operators/freq.py::estimate_join_size and HLL key counts) when
    even counting is too expensive — thresholds stay the same. The
    row-limit default is a stand-in for the real driver: compare
    against ``spark.sql.autoBroadcastJoinThreshold`` in BYTES on your
    actual row width.
    """
    if broadcast_row_limit < 1:
        raise ValueError(
            f"broadcast_row_limit must be >= 1, got {broadcast_row_limit}"
        )
    if skew_threshold <= 1.0:
        raise ValueError(
            f"skew_threshold must be > 1, got {skew_threshold}"
        )
    counts = fact.groupBy(F.col(fact_key).alias("_k")).agg(
        F.count("*").alias("_n")
    )
    stats = counts.agg(
        F.count("*").alias("fact_keys"),
        F.sum("_n").alias("fact_rows"),
        F.max("_n").alias("max_key_n"),
        F.expr("percentile(_n, 0.5)").alias("p50_key_n"),
    )
    dim_n = dim.select(F.col(dim_key)).agg(F.count("*").alias("dim_rows"))
    joined = stats.crossJoin(F.broadcast(dim_n))
    skew_factor = F.col("max_key_n") / F.col("p50_key_n")
    strategy = (
        F.when(F.col("dim_rows") <= broadcast_row_limit, F.lit("broadcast"))
        .when(skew_factor > skew_threshold, F.lit("salted_shuffle"))
        .otherwise(F.lit("shuffle"))
    )
    salt = F.when(
        strategy == "salted_shuffle",
        F.least(F.lit(64), F.ceil(skew_factor)),
    ).otherwise(F.lit(0).cast("bigint"))
    return joined.select(
        "fact_rows",
        "dim_rows",
        "fact_keys",
        "max_key_n",
        "p50_key_n",
        skew_factor.alias("skew_factor"),
        strategy.alias("strategy"),
        salt.alias("salt_buckets"),
    )
