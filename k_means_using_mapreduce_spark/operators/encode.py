"""Feature encoding for training pipelines: smoothed target encoding
and categorical association (mutual information).

Target encoding replaces a categorical value with the (smoothed) mean
of the label among rows sharing it — the classic high-cardinality
categorical feature. Two leakage regimes:

- :func:`target_encode` — fit-time table ``(category, encoding)``,
  applied to a DIFFERENT split than it was fit on (the caller's
  responsibility, like any fitted transformer).
- :func:`target_encode_loo` — leave-one-out per-row encoding for
  encoding the SAME rows the statistic is computed from: each row's
  own label is subtracted before smoothing, the standard defense
  against target leakage (a category of size 1 falls back to the
  prior entirely).

Smoothing is the Bayesian/empirical-prior form
``(sum + alpha·prior) / (n + alpha)``: rare categories shrink toward
the global mean instead of memorizing noise.

:func:`mutual_information` scores association between two categorical
columns from their joint histogram — the drift/redundancy check
("does `source` already determine `lang`?") next to lm.source_divergence
(distributional drift) and cleaning.psi_drift (numeric shape drift).

Scale shapes: target encodings are one groupBy over (category) —
map-side combinable, |categories| result rows, broadcast back for
application. LOO adds no second shuffle: the per-category sums join
back and each row subtracts itself arithmetically. MI aggregates the
joint histogram (|X|·|Y| rows) and derives the margins from it —
raw data is scanned once.

The reference has no feature-engineering surface (SURVEY.md §2);
extension charter as functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    *,
    alpha: float = 10.0,
) -> DataFrame:
    """Fit a smoothed target-encoding table: ``(category, n,
    encoding)`` with ``encoding = (sum + alpha·prior)/(n + alpha)``,
    prior = global target mean. Rows with NULL target are excluded
    from the statistic. Apply by broadcast-joining on the category
    (to a split the table was NOT fit on)."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    t = F.col(target_col).cast("double")
    work = df.where(t.isNotNull()).select(
        F.col(cat_col).alias("category"), t.alias("_t")
    )
    prior = work.agg(F.avg("_t")).first()[0]
    if prior is None:
        raise ValueError(f"no non-null {target_col} values to encode from")
    return work.groupBy("category").agg(
        F.count("*").alias("n"),
        (
            (F.sum("_t") + F.lit(alpha * prior))
            / (F.count("*") + F.lit(alpha))
        ).alias("encoding"),
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    *,
    alpha: float = 10.0,
) -> DataFrame:
    """Leave-one-out smoothed target encoding of the INPUT rows:
    every input row, plus ``loo_encoding`` computed from the other
    rows of its category — ``(sum - t_i + alpha·prior)/(n - 1 +
    alpha)``. NULL-target rows pass through encoded from the full
    category statistic (they contributed nothing to subtract)."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    t = F.col(target_col).cast("double")
    prior_row = df.agg(F.avg(t)).first()[0]
    if prior_row is None:
        raise ValueError(f"no non-null {target_col} values to encode from")
    prior = float(prior_row)
    stats = (
        df.where(t.isNotNull())
        .groupBy(F.col(cat_col).alias("_cat"))
        .agg(F.sum(t).alias("_sum"), F.count("*").alias("_n"))
    )
    joined = df.join(
        F.broadcast(stats), df[cat_col] == stats["_cat"], "left"
    ).drop("_cat")
    s = F.coalesce(F.col("_sum"), F.lit(0.0))
    n = F.coalesce(F.col("_n"), F.lit(0))
    # subtract the own label only when the row actually contributed to
    # the joined statistic: a NULL-category row never matches the join
    # (NULL != NULL), so subtracting from the empty stat would produce
    # a negative count — those rows encode to the prior instead
    matched = F.col("_n").isNotNull()
    own = F.when(matched & t.isNotNull(), t).otherwise(F.lit(0.0))
    own_n = F.when(matched & t.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    # nullif: a singleton category at alpha=0 has no other rows to
    # learn from — the encoding is undefined, so NULL (ANSI mode would
    # otherwise raise DIVIDE_BY_ZERO)
    denom = F.nullif(
        (n - own_n + F.lit(alpha)).cast("double"), F.lit(0.0)
    )
    loo = (s - own + F.lit(alpha * prior)) / denom
    return joined.withColumn("loo_encoding", loo).drop("_sum", "_n")


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns from
    their joint histogram: one row ``(mi, n)`` with
    ``mi = Σ_xy p(xy)·ln(p(xy)/(p(x)p(y)))`` over non-NULL pairs.
    0 ⇔ independent; min(H(X), H(Y)) when one determines the other.
    The margins derive from the joint (single scan); every term is
    positive-count so no log guards are needed."""
    joint = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .agg(F.count("*").alias("nxy"))
    )
    mx = joint.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("y").agg(F.sum("nxy").alias("ny"))
    tot = joint.agg(F.sum("nxy").alias("n"))
    return (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("nxy") / F.col("n"))
                * F.log(
                    (F.col("nxy").cast("double") * F.col("n"))
                    / (F.col("nx").cast("double") * F.col("ny"))
                )
            ).alias("mi"),
            F.first("n").alias("n"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    *,
    grid: int = 200,
    out_col: str = "normalized",
) -> DataFrame:
    """Cross-group quantile normalization: replace each value with the
    GLOBAL distribution's value at the same within-group rank — the
    rank-transform that makes per-source score distributions comparable
    (a web source's 0.9-quantile quality maps to the same normalized
    number as a books source's 0.9-quantile), the microarray-style
    quantile normalization applied to corpus scores.

    Mechanics: within-group ``percent_rank`` (total order on
    ``(value, id)`` — deterministic under ties), quantized to a
    ``grid``-point lattice, joined against the global interpolated
    quantile table (one ``percentile`` aggregate over the whole
    column → grid+1 rows, broadcast). Approximation error is one
    global-quantile grid step — tighten with ``grid`` — and the
    output preserves within-group order (monotone map).

    Scale: one group-keyed window shuffle + one broadcast join; the
    global quantile aggregate is the only full-column reduction. The
    ``percentile`` call is exact (sort-based) — swap in
    ``percentile_approx`` at extreme scale, noting it leaves the
    cross-engine-reproducibility contract.
    """
    if grid < 10:
        raise ValueError(f"grid must be >= 10, got {grid}")
    v = F.col(value_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(F.col(value_col), F.col(id_col))
    q = F.round(F.percent_rank().over(w) * grid).cast("int")
    pcts = [i / grid for i in range(grid + 1)]
    # DENSE grid: the (grid+1) percentiles' refine windows would cover
    # the whole column, so the bracket path buys no memory bound and
    # pays per-row work per percentile (measured 20x slower at
    # grid=100); the single buffered percentile aggregate IS the right
    # plan here — one buffer, m rank lookups.
    gq = df.agg(
        F.percentile(v, F.array(*[F.lit(p) for p in pcts])).alias("_qs")
    ).select(F.posexplode("_qs").alias("_gq_i", "_gq_v"))
    return (
        df.withColumn("_q", q)
        .join(F.broadcast(gq), F.col("_q") == F.col("_gq_i"))
        .withColumn(out_col, F.col("_gq_v"))
        .drop("_q", "_gq_i", "_gq_v")
    )


def woe_table(
    df: DataFrame,
    category_col: str,
    label_col: str,
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence table per category — the credit-scoring /
    feature-screening encoding: ``(category, n, pos, neg, woe,
    iv_term)`` with

        woe = ln( (pos_i + α)/(pos_tot + α·C) /
                  ((neg_i + α)/(neg_tot + α·C)) )

    (add-α smoothing keeps empty cells finite — the Laplace twin of
    :func:`target_encode`'s prior), and the information-value terms
    ``iv_term = (p_pos - p_neg) · woe`` whose SUM is the classic IV
    screen (< 0.02 useless, > 0.3 strong). ``label_col`` must be
    0/1-valued. One grouped aggregate + a 1-row broadcast of totals;
    the category table is |C| rows, broadcastable for the apply join.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (smoothing), got {alpha}")
    lab = F.col(label_col).cast("double")
    per = (
        df.where(F.col(category_col).isNotNull() & lab.isNotNull())
        .groupBy(category_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(lab).cast("long").alias("pos"),
            (F.count("*") - F.sum(lab)).cast("long").alias("neg"),
        )
    )
    tot = per.agg(
        F.sum("pos").cast("double").alias("_pt"),
        F.sum("neg").cast("double").alias("_nt"),
        F.count("*").cast("double").alias("_c"),
    )
    a = F.lit(float(alpha))
    joined = per.crossJoin(F.broadcast(tot))
    p_pos = (F.col("pos") + a) / (F.col("_pt") + a * F.col("_c"))
    p_neg = (F.col("neg") + a) / (F.col("_nt") + a * F.col("_c"))
    woe = F.log(p_pos / p_neg)
    return joined.select(
        category_col,
        "n",
        "pos",
        "neg",
        woe.alias("woe"),
        ((p_pos - p_neg) * woe).alias("iv_term"),
    )


def information_value(
    df: DataFrame, category_col: str, label_col: str, *, alpha: float = 0.5
) -> DataFrame:
    """One row ``(categories, iv)`` — the summed IV screen for one
    categorical feature against a binary label."""
    t = woe_table(df, category_col, label_col, alpha=alpha)
    return t.agg(
        F.count("*").cast("long").alias("categories"),
        F.sum("iv_term").alias("iv"),
    )


def hashed_features(
    df: DataFrame,
    text_col: str,
    dims: int = 64,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick (signed feature hashing) sparse vectors.

    Weinberger-style: each token lands in bucket
    ``md5_int60(token) % dims`` with sign ``±1`` drawn from an
    INDEPENDENT slice of the same hash (``(h div dims) % 2``), so
    collisions cancel in expectation — the property that makes the
    hashed inner product an unbiased estimate. Output is the sparse
    COO form ``(id, dim, weight)`` with ``weight = Σ signs`` over the
    document's tokens (signed term frequency); zero-weight cells
    (perfectly cancelled collisions) are RETAINED so nnz accounting
    stays faithful to the token stream.

    No vocabulary, no fitting, no shuffle beyond the final
    ``(id, dim)`` groupBy — the standard featurizer for unbounded
    token spaces at 100 TB (state is O(dims), not O(vocab)). The
    integer division uses SQL ``div`` (int64-exact) so the Spark path
    and the SQL oracle (``//``) agree bit-for-bit.
    """
    if dims < 2:
        raise ValueError(f"dims must be >= 2, got {dims}")
    from ..functions.text import tokens
    from .dedup import md5_int60

    from ..sources.loaders import fan_out

    tok = fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col))).select(
        "id",
        F.explode(tokens(text_col)).alias("tok"),
    ).select("id", md5_int60(F.col("tok")).alias("_h"))
    # `div` keeps the quotient on int64 — a double `/` would shave
    # mantissa bits off the 60-bit hash before the parity check.
    half = F.expr(f"_h div {int(dims)}")
    sign = (F.pmod(half, F.lit(2)) * 2 - 1).cast("long")
    return (
        tok.select(
            "id",
            F.pmod(F.col("_h"), F.lit(dims)).cast("int").alias("dim"),
            sign.alias("sign"),
        )
        .groupBy("id", "dim")
        .agg(F.sum("sign").cast("long").alias("weight"))
    )


def hashed_corpus_profile(features: DataFrame) -> DataFrame:
    r"""Corpus-level view of a ``hashed_features`` relation: per dim,
    ``(dim, docs, entries, total_weight, abs_weight)`` — the load/
    cancellation profile that tells you whether ``dims`` is big
    enough (heavy \|total\| ≪ abs means healthy sign cancellation,
    abs concentrated on few dims means raise ``dims``)."""
    return features.groupBy("dim").agg(
        F.countDistinct("id").cast("long").alias("docs"),
        F.count(F.lit(1)).cast("long").alias("entries"),
        F.sum("weight").cast("long").alias("total_weight"),
        F.sum(F.abs(F.col("weight"))).cast("long").alias("abs_weight"),
    )
