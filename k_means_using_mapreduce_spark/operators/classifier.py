"""Hashing-trick linear text classifier scoring — the relational form
of fastText-style quality filtering.

Every big-corpus pipeline ends with a learned quality filter (GPT-3's
WebText logistic classifier, LLaMA's fastText filter, FineWeb-Edu's
scorer). Training happens offline on a small labeled set; what must
run at corpus scale is SCORING — and scoring a linear bag-of-words
model is a pure relational program, no ML runtime needed:

    explode tokens → feature index = hash(token) mod dim
    → per-(doc, feature) term frequency
    → broadcast-join the (index, weight) table
    → per-doc weighted sum + bias → sigmoid.

Scale shape: one shuffle keyed (doc, feature-index) for the tf counts
(map-side partial combine), weight table broadcast (a dim=2^20 float
table is 8 MB), final per-doc aggregation partial-combines too. No
Python in the path; the sigmoid is a codegen'd expression.

The hashing trick (Weinberger et al., ICML 2009) is what makes the
weight side broadcastable: the vocabulary is unbounded, the feature
space is fixed ``dim``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .dedup import md5_int60


def feature_index(col, dim: int):
    """Hashed feature index in [0, dim): 60-bit md5 of the token mod
    dim — the same engine-portable hash family as the dedup/sampling
    operators (DuckDB twin: ``('0x'||substr(md5(t),1,15))::BIGINT %
    dim``)."""
    return (md5_int60(col) % F.lit(dim)).cast("long")


def score_documents(
    df: DataFrame,
    weights: DataFrame,
    *,
    dim: int,
    bias: float = 0.0,
    threshold: float = 0.5,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents with a linear model over hashed token counts.

    ``weights`` is an ``(idx: long, w: double)`` relation — the trained
    model, typically thousands-to-millions of rows, always broadcast.
    Output per document: ``(id, z, prob, keep)`` where ``z = bias +
    Σ_f tf(f)·w(f)``, ``prob = sigmoid(z)``, ``keep = prob >=
    threshold``. Documents with no tokens — including NULL text, which
    is treated as an empty bag — score ``z = bias`` and are present in
    the output.

    Missing weight rows (hash buckets the training set never touched)
    contribute 0 — the left join's coalesce, not a dropped document.
    """
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    from ..sources.loaders import fan_out

    tf = (
        fan_out(df.select(F.col(id_col).alias(id_col), F.col(content_col)))
        .select(F.col(id_col).alias(id_col), F.explode(tokens(content_col)).alias("_tok"))
        .select(id_col, feature_index(F.col("_tok"), dim).alias("idx"))
        .groupBy(id_col, "idx")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        tf.join(F.broadcast(weights), "idx", "left")
        .groupBy(id_col)
        .agg(
            (
                F.lit(float(bias))
                + F.sum(F.col("tf") * F.coalesce(F.col("w"), F.lit(0.0)))
            ).alias("z")
        )
    )
    # empty-bag documents never reach tf; restore them at z = bias.
    # size() of a NULL array is NULL (ANSI) / -1 (legacy) — coalesce to
    # -1 and compare <= 0 so NULL-text docs land here instead of
    # silently vanishing from the output
    empties = (
        df.select(F.col(id_col).alias(id_col), tokens(content_col).alias("_t"))
        .where(F.coalesce(F.size("_t"), F.lit(-1)) <= 0)
        .select(id_col, F.lit(float(bias)).alias("z"))
    )
    scored = scored.unionByName(empties)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
    return scored.select(
        id_col,
        "z",
        prob.alias("prob"),
        (prob >= F.lit(threshold)).alias("keep"),
    )


def pseudo_weights(spark, *, dim: int, scale: int = 1997):
    """Deterministic engine-portable pseudo-weight table for tests and
    contract queries: ``w(idx) = ((idx * 2654435761) % scale) / scale
    - 0.5`` — Knuth's multiplicative-hash constant spreads signs/values
    uniformly. Integer arithmetic only, so DuckDB computes the exact
    same doubles. A real deployment replaces this with trained
    weights; the scoring plan is identical.
    """
    return spark.range(dim).select(
        F.col("id").alias("idx"),
        (
            ((F.col("id") * F.lit(2654435761)) % F.lit(scale)).cast("double")
            / F.lit(float(scale))
            - F.lit(0.5)
        ).alias("w"),
    )


def naive_bayes_confusion(
    df: DataFrame,
    label_col: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    test_pct: int = 20,
    alpha: float = 1.0,
) -> DataFrame:
    """Multinomial Naive Bayes trained on a deterministic hash split,
    evaluated as a confusion matrix on the holdout — the full
    train→score→evaluate loop of a corpus label classifier run as one
    relational program (the TRAINED twin of the pseudo-weight scorer
    above, and of functions/text.py's rule-based lang_id).

    Train (md5 bucket >= ``test_pct``): per-(label, token) counts, per-
    label token totals, global train vocabulary V, doc-count priors.
    Score (holdout): explode test tokens, cross the small label list,
    LEFT-join the count table — Laplace ``ln((cnt+α)/(N_l+α·(V+1)))``
    per token (absent counts are cnt=0, sharing the same unknown-mass
    convention as lm.py::fit_unigram_model) plus ``ln`` prior; argmax
    by (score, label) via one per-doc window. Token-less docs fall
    back to the prior-only argmax.

    Scale shape: training is one token-keyed aggregation (map-side
    combined); the model (|labels|·|vocab| rows) broadcasts; scoring
    shuffles (doc, label) partial sums only. The |labels|× row blowup
    on the scoring side is bounded by the label cardinality — this is
    a per-class scorer, not a join explosion.

    Returns ``(label, pred_label, n_docs)``.
    """
    if not 0 < test_pct < 100:
        raise ValueError(f"test_pct must be in (0, 100), got {test_pct}")
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    from pyspark.sql.window import Window

    from .sampling import hash_bucket

    base = df.where(
        F.col(label_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("label"),
        tokens(F.col(text_col)).alias("_t"),
        (hash_bucket(id_col, 100) < F.lit(test_pct)).alias("_is_test"),
    )
    train = base.where(~F.col("_is_test"))
    test = base.where(F.col("_is_test"))

    tok_counts = (
        train.select("label", F.explode("_t").alias("token"))
        .groupBy("label", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    label_totals = tok_counts.groupBy("label").agg(
        F.sum("cnt").alias("n_tok")
    )
    vocab = tok_counts.select("token").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("v")
    )
    n_train = train.agg(F.count(F.lit(1)).cast("double").alias("n_all"))
    priors = (
        train.groupBy("label")
        .agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
        .crossJoin(F.broadcast(n_train))
        .select("label", F.log(F.col("n_docs") / F.col("n_all")).alias("prior"))
    )
    # per-label smoothing denominator, vocab mass convention of lm.py
    denoms = (
        label_totals.crossJoin(F.broadcast(vocab))
        .select(
            "label",
            (F.col("n_tok") + F.lit(alpha) * (F.col("v") + F.lit(1.0))).alias(
                "denom"
            ),
        )
        .join(priors, "label")
    )

    pairs = test.select(
        "_id", F.col("label").alias("true_label"), F.explode("_t").alias("token")
    )
    scored_tokens = (
        pairs.crossJoin(
            F.broadcast(denoms.select("label", "denom"))
        )
        .join(
            F.broadcast(
                tok_counts.select(
                    F.col("label").alias("_ml"),
                    F.col("token").alias("_mt"),
                    "cnt",
                )
            ),
            (F.col("_ml") == F.col("label"))
            & (F.col("_mt") == F.col("token")),
            "left",
        )
        .select(
            "_id",
            "true_label",
            "label",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0.0)) + F.lit(alpha))
                / F.col("denom")
            ).alias("lp"),
        )
    )
    token_scores = scored_tokens.groupBy("_id", "true_label", "label").agg(
        F.sum("lp").alias("tok_score")
    )
    # every test doc × label gets a row (prior-only when token-less)
    doc_label = (
        test.select("_id", F.col("label").alias("true_label"))
        .crossJoin(F.broadcast(denoms.select("label", "prior")))
        .join(token_scores, ["_id", "true_label", "label"], "left")
        .select(
            "_id",
            "true_label",
            "label",
            (
                F.col("prior") + F.coalesce(F.col("tok_score"), F.lit(0.0))
            ).alias("score"),
        )
    )
    win = Window.partitionBy("_id").orderBy(
        F.col("score").desc(), F.col("label")
    )
    preds = (
        doc_label.withColumn("_rk", F.row_number().over(win))
        .where(F.col("_rk") == 1)
        .select("true_label", F.col("label").alias("pred_label"))
    )
    return (
        preds.groupBy(F.col("true_label").alias("label"), "pred_label")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
