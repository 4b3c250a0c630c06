"""Contrastive term statistics: log-odds-ratio with an informative
Dirichlet prior (Monroe, Colaresi & Quinn 2008, "Fightin' Words") —
what vocabulary distinguishes one document group from the rest of the
corpus. The z-scored log-odds is the standard replacement for raw
TF-IDF contrast when group sizes are wildly unequal: the prior shrinks
rare-word noise and the variance term normalizes away group size.

For group g, token w, with counts ``y_gw``, group total ``n_g``,
corpus totals ``y_w`` / ``N``, and prior ``a_w = a0 · y_w / N``:

    delta_gw = ln( (y_gw + a_w) / (n_g + a0 − y_gw − a_w) )
             − ln( (y_rw + a_w) / (n_r + a0 − y_rw − a_w) )
    z_gw     = delta_gw / sqrt( 1/(y_gw + a_w) + 1/(y_rw + a_w) )

where ``y_rw = y_w − y_gw`` and ``n_r = N − n_g`` are rest-of-corpus
counts — so each group is contrasted against everything else in ONE
pass, no per-group anti-join.

Scale shape: one tokenize+groupBy to per-(group, token) counts (map-
side combined), one token-keyed join onto per-token corpus totals
(both sides already partitioned by token), group totals and the N
scalar broadcast (G+1 rows). The optional top-k is a per-group window
over the (group, token) table — already tiny relative to the corpus.

Reference scope: extension surface; the reference engine
(master.py:27-150) has no text operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def group_token_counts(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-(group, token) occurrence counts: ``(grp, token, y)``."""
    from ..sources.loaders import fan_out

    return (
        fan_out(df.select(F.col(group_col).alias("grp"), F.col(text_col)))
        .select(
            "grp",
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("grp", "token")
        .agg(F.count("*").alias("y"))
    )


def log_odds_terms(
    counts: DataFrame, *, prior_strength: float = 100.0
) -> DataFrame:
    """z-scored log-odds vs rest-of-corpus for every (group, token):
    ``(grp, token, y, y_rest, delta, z)``. ``prior_strength`` is a0,
    the total pseudo-count mass spread over the vocabulary in
    proportion to corpus frequency."""
    if prior_strength <= 0:
        raise ValueError(f"prior_strength must be > 0, got {prior_strength}")
    tok_tot = counts.groupBy("token").agg(F.sum("y").alias("y_tot"))
    grp_tot = counts.groupBy("grp").agg(F.sum("y").alias("n_g"))
    corpus = counts.agg(F.sum("y").alias("n_all"))
    a0 = F.lit(float(prior_strength))
    joined = (
        counts.join(tok_tot, "token")
        .join(F.broadcast(grp_tot), "grp")
        .crossJoin(F.broadcast(corpus))
    )
    a_w = a0 * F.col("y_tot").cast("double") / F.col("n_all").cast("double")
    y = F.col("y").cast("double")
    y_rest = (F.col("y_tot") - F.col("y")).cast("double")
    n_g = F.col("n_g").cast("double")
    n_r = (F.col("n_all") - F.col("n_g")).cast("double")
    delta = F.log((y + a_w) / (n_g + a0 - y - a_w)) - F.log(
        (y_rest + a_w) / (n_r + a0 - y_rest - a_w)
    )
    var = F.lit(1.0) / (y + a_w) + F.lit(1.0) / (y_rest + a_w)
    return joined.select(
        "grp",
        "token",
        "y",
        (F.col("y_tot") - F.col("y")).alias("y_rest"),
        delta.alias("delta"),
        (delta / F.sqrt(var)).alias("z"),
    )


def signature_terms(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    *,
    k: int = 5,
    prior_strength: float = 100.0,
) -> DataFrame:
    """Top-k distinguishing tokens per group by z-scored log-odds,
    ties broken by token (deterministic under retries):
    ``(grp, token, y, y_rest, delta, z, rank)``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    scored = log_odds_terms(
        group_token_counts(df, group_col, text_col),
        prior_strength=prior_strength,
    )
    w = Window.partitionBy("grp").orderBy(F.col("z").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
