"""Lightweight coresets for K-Means: compress N points into a small
weighted proxy set whose weighted SSE approximates the full data's for
EVERY candidate solution — then fit on the coreset.

Method (Bachem, Lucic & Krause 2018, "Scalable k-Means Clustering via
Lightweight Coresets"): the sampling probability of point x is

    q(x) = 1/2 · 1/n  +  1/2 · d(x, μ)² / Σ_y d(y, μ)²

— half uniform mass, half distance-to-the-global-mean mass. Unlike
sensitivity sampling over a k-means++ solution, q(x) is CLOSED FORM
(one mean, one scalar), which is why this is the coreset construction
that actually fits a 100 TB pipeline: two aggregation passes over the
data, no iterative seeding pass, no driver loop.

Spark shape: pass 1 computes the D-dimensional mean (D doubles to the
driver — model-sized, the kmeans-centroid discipline); pass 2 computes
each point's d², the scalar Σd² arrives by broadcast (1-row cross
join, never collected), and selection + weighting are narrow
expressions. Zero shuffles beyond the two tiny aggregates.

Sampling is the Poisson (independent-inclusion) variant: point x
enters the coreset iff ``u(x) <= p(x) = min(1, m·q(x))`` with weight
``1/p(x)``, so every weighted sum is unbiased (E[Σ w·f] = Σ f) and the
expected size is ≤ m. The coin ``u(x) = (int60(md5(salt:id)) + 1)/2^60``
is the house deterministic-sampling rule (operators/sampling.py):
retries, repartitions, and the DuckDB oracle all pick the same points.

The reference implements no sampling or compression at all (its init
samples K points via random.sample on the driver, master.py:44); this
operator is part of the scale surface the rebuild adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import sq_dist_to_literal

_TWO60 = 1 << 60


def lightweight_coreset(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    m: int,
    salt: str = "lwcs",
) -> DataFrame:
    """Sample a lightweight coreset of expected size ≤ ``m``.

    Output: input columns + ``(q, p, weight)`` for the SELECTED points
    only. ``id_col`` must be unique (the coin is a pure function of the
    id — duplicate ids would correlate their coins)."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    mu_rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .collect()
    )
    if not mu_rows:
        raise ValueError("cannot build a coreset from an empty input")
    mu = [r["m"] for r in sorted(mu_rows, key=lambda r: r["pos"])]
    with_d2 = df.withColumn("_d2", sq_dist_to_literal(F.col(vec_col), mu))
    totals = with_d2.agg(
        F.sum("_d2").alias("_s"), F.count("*").alias("_n")
    )
    joined = with_d2.join(F.broadcast(totals))
    q = F.lit(0.5) / F.col("_n") + F.when(
        F.col("_s") > 0, F.lit(0.5) * F.col("_d2") / F.col("_s")
    ).otherwise(F.lit(0.0))
    p = F.least(F.lit(1.0), F.lit(float(m)) * q)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(float(_TWO60))
    return (
        joined.withColumn("q", q)
        .withColumn("p", p)
        .where(u <= F.col("p"))
        .withColumn("weight", F.lit(1.0) / F.col("p"))
        .drop("_d2", "_s", "_n")
    )
