"""Seeded-reproducible Laplace noise injection over group aggregates.

These operators apply the Laplace MECHANISM SHAPE of Dwork et al.
2006 — Laplace(sensitivity/ε) noise on counts, clipped sums, and
their mean composition — but they are NOT an ε-DP release and must
not be labeled one: the draw is a deterministic public function of
(seed, group key) (md5 inverse-CDF), so anyone who knows the seed can
recompute the noise and subtract it, recovering the exact aggregates.
Under the standard DP threat model the mechanism is public; a seed
that is committed to a repo, passed through a contract, or reproduced
by an oracle is public too, and the guarantee is vacuous.

What they ARE for: deterministic jitter/perturbation of released
aggregates (fuzzing dashboards, testing consumer robustness to noise,
simulating a DP pipeline's utility loss at a given ε) where
reproducibility across runs, retries, and engines is the point —
the same doctrine as the repo's seeded md5-coin sampling.

To obtain a real ε-DP release from this machinery you must (a) derive
``seed`` from a high-entropy secret that is never committed, logged,
or shared with the data consumer, (b) never reuse it against the same
data, and (c) accept that the release is then NOT reproducible by any
oracle or test. The ``epsilon`` parameter is the nominal scale dial
(noise b = sensitivity/ε); it prices utility, not privacy, unless (a)
to (c) hold.

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


def noised_counts(
    df: DataFrame,
    keys: Sequence[str],
    *,
    epsilon: float,
    seed: int,
) -> DataFrame:
    """Noised group counts (reproducible): ``(keys..., noisy_count)``
    with deterministic Laplace(1/ε)-shaped jitter (count sensitivity 1
    under add/remove-one-row adjacency). See the module docstring: this
    is NOT an ε-DP release unless the seed is a genuine secret."""
    _check(epsilon, keys)
    kc = [F.col(k) for k in keys]
    out = df.groupBy(*keys).agg(F.count("*").alias("_n"))
    noise = laplace_noise(1.0 / epsilon, seed=seed, key_cols=kc)
    return out.select(
        *keys, (F.col("_n").cast("double") + noise).alias("noisy_count")
    )


def noised_sums(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    *,
    epsilon: float,
    clip: float,
    seed: int,
) -> DataFrame:
    """Noised group sums (reproducible) of ``value`` clipped into
    [0, clip]: ``(keys..., noisy_sum)`` with Laplace(clip/ε)-shaped
    jitter — the clip bound IS the sensitivity, so it is enforced
    in-query (``least(greatest(v, 0), clip)`` inside the aggregation
    scan), never assumed. NULL values contribute 0 (absent). NOT an
    ε-DP release unless the seed is a genuine secret (module doc)."""
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


def noised_means(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    *,
    epsilon: float,
    clip: float,
    seed: int,
) -> DataFrame:
    """Noised group means (reproducible) by the sequential-composition
    shape: ε/2-scaled jitter on the clipped sum, ε/2 on the count
    (distinct draw streams), mean = noisy_sum / max(noisy_count, 1):
    ``(keys..., noisy_mean)``. One aggregation scan computes both
    partials. NOT an ε-DP release unless the seed is a genuine secret
    (module doc)."""
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
