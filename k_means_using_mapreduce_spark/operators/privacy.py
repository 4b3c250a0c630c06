"""Differentially-private aggregate release (Laplace mechanism).

The privacy completion of the audit operators in
operators/cleaning.py (k-anonymity, l-diversity): those REPORT
re-identification risk, these RELEASE aggregates with the classic
ε-DP Laplace mechanism (Dwork et al. 2006) — noisy counts, clipped
noisy sums, and their mean composition.

Determinism doctrine: the Laplace draw is the inverse CDF applied to
the engine's md5-uniform house hash of (seed, group key) — one draw
per released cell, identical on every run, retry, and partition
layout, and exactly reproducible in the DuckDB oracle
(contracts/privacy_queries.py). A fresh release = a new seed, and
privacy accounting stays honest as long as seeds are not reused
against the same data (noted in every docstring; the classic
pseudo-random-generator caveat of every deployed DP system).

Scale shape: each release is ONE map-side-combined groupBy of the
key projection; noise is a per-GROUP scalar expression on the
already-aggregated rows (|groups| rows, not |input|). Clipping is a
row-level ``least/greatest`` folded into the same aggregation scan.

Reference scope note: the reference engine (master.py:27-150) has no
privacy surface; this is training-data-pipeline extension scope
(releasing corpus statistics about user-derived data).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO_60 = float(1 << 60)


def _check(epsilon: float, keys: Sequence[str]) -> None:
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if not keys:
        raise ValueError("need at least one group key")


def laplace_noise(scale_b: float, *, seed: int, key_cols: Sequence[Column]) -> Column:
    """Deterministic Laplace(b) draw per key: inverse CDF
    ``-b * sign(u - 1/2) * ln(1 - 2|u - 1/2|)`` of the md5-uniform
    ``u = (int60(md5(seed:key...)) + 0.5) / 2^60`` — u is never
    exactly 0, 1/2 ± 1/2, so the log is always finite."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), *key_cols)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_TWO_60)
    centered = u - F.lit(0.5)
    return (
        F.lit(-float(scale_b))
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )


def dp_counts(
    df: DataFrame,
    keys: Sequence[str],
    *,
    epsilon: float,
    seed: int = 0,
) -> DataFrame:
    """ε-DP group counts: ``(keys..., noisy_count)`` with
    Laplace(1/ε) noise (count sensitivity 1 under add/remove-one-row
    adjacency). Do NOT release twice with the same seed AND the same
    data under a fresh ε budget — that re-uses the draw."""
    _check(epsilon, keys)
    kc = [F.col(k) for k in keys]
    out = df.groupBy(*keys).agg(F.count("*").alias("_n"))
    noise = laplace_noise(1.0 / epsilon, seed=seed, key_cols=kc)
    return out.select(
        *keys, (F.col("_n").cast("double") + noise).alias("noisy_count")
    )


def dp_sums(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    *,
    epsilon: float,
    clip: float,
    seed: int = 0,
) -> DataFrame:
    """ε-DP group sums of ``value`` clipped into [0, clip]:
    ``(keys..., noisy_sum)`` with Laplace(clip/ε) noise — the clip
    bound IS the sensitivity, so it must be enforced in-query (it
    is: ``least(greatest(v, 0), clip)`` inside the aggregation scan),
    never assumed. NULL values contribute 0 (absent)."""
    _check(epsilon, keys)
    if clip <= 0:
        raise ValueError(f"clip must be > 0, got {clip}")
    kc = [F.col(k) for k in keys]
    clipped = F.least(
        F.greatest(F.col(value).cast("double"), F.lit(0.0)), F.lit(float(clip))
    )
    out = df.groupBy(*keys).agg(
        F.sum(F.coalesce(clipped, F.lit(0.0))).alias("_s")
    )
    noise = laplace_noise(float(clip) / epsilon, seed=seed, key_cols=kc)
    return out.select(*keys, (F.col("_s") + noise).alias("noisy_sum"))


def dp_means(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    *,
    epsilon: float,
    clip: float,
    seed: int = 0,
) -> DataFrame:
    """ε-DP group means by sequential composition: ε/2 on the clipped
    sum, ε/2 on the count (distinct seed streams), mean =
    noisy_sum / max(noisy_count, 1): ``(keys..., noisy_mean)``. One
    aggregation scan computes both partials."""
    _check(epsilon, keys)
    if clip <= 0:
        raise ValueError(f"clip must be > 0, got {clip}")
    kc = [F.col(k) for k in keys]
    clipped = F.least(
        F.greatest(F.col(value).cast("double"), F.lit(0.0)), F.lit(float(clip))
    )
    out = df.groupBy(*keys).agg(
        F.sum(F.coalesce(clipped, F.lit(0.0))).alias("_s"),
        F.count("*").alias("_n"),
    )
    half = epsilon / 2.0
    s_noise = laplace_noise(
        float(clip) / half, seed=seed, key_cols=[F.lit("sum"), *kc]
    )
    n_noise = laplace_noise(
        1.0 / half, seed=seed, key_cols=[F.lit("count"), *kc]
    )
    return out.select(
        *keys,
        (
            (F.col("_s") + s_noise)
            / F.greatest(F.col("_n").cast("double") + n_noise, F.lit(1.0))
        ).alias("noisy_mean"),
    )
