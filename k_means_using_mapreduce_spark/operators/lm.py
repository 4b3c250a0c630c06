"""Unigram language-model scoring — the perplexity-filter shape.

CCNet-style corpus filtering scores every document against a language
model and drops the tails (gibberish scores terribly, boilerplate
suspiciously well). The real pipelines use a KenLM 5-gram; the
distributed shape is identical with a unigram model, and a unigram
model is exactly computable — so this module is both a usable
lightweight scorer and the tested scaffolding that a KenLM Pandas UDF
would slot into (swap `score_documents` internals, keep the contract).

Scale notes: the model is a (token, logprob) table of |vocab| rows —
broadcast. Scoring is explode → broadcast-join → per-doc sum: one
shuffle keyed by doc id carrying (id, logprob) pairs. Fitting is one
token-keyed aggregation. Nothing touches the driver except the vocab
size used for smoothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens


def fit_unigram_model(
    df: DataFrame, *, text_col: str = "text", alpha: float = 1.0
) -> DataFrame:
    """Unigram logprobs with add-``alpha`` (Laplace) smoothing.

    Returns ``(token, n, logprob)`` where
    ``logprob = ln((n + alpha) / (N + alpha·(V + 1)))`` — the ``+ 1``
    reserves one share of mass for the unknown token, whose logprob is
    ``ln(alpha / (N + alpha·(V + 1)))`` (see :func:`score_documents`).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count("*").alias("_vocab")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "token",
        "n",
        F.log(
            (F.col("n") + F.lit(alpha))
            / (F.col("_total") + F.lit(alpha) * (F.col("_vocab") + F.lit(1.0)))
        ).alias("logprob"),
    )


def score_documents(
    df: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document mean token logprob against a fitted model.

    Output: ``(id, n_tokens, logprob_sum, avg_logprob)``; higher
    avg_logprob = more typical of the model corpus. Out-of-vocabulary
    tokens take the reserved unknown mass
    ``ln(alpha / (N + alpha·(V + 1)))``, recomputed exactly from the
    model's integer counts (``alpha`` must match the fit — it is not
    stored in the model table). Documents with no tokens are omitted
    (there is nothing to score).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    unk = model.agg(
        F.log(
            F.lit(alpha)
            / (F.sum("n") + F.lit(alpha) * (F.count("*") + F.lit(1.0)))
        ).alias("unk_logprob")
    )
    pairs = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    joined = (
        pairs.join(F.broadcast(model.select("token", "logprob")), "token", "left")
        .crossJoin(F.broadcast(unk))
        .withColumn("_lp", F.coalesce(F.col("logprob"), F.col("unk_logprob")))
    )
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("_lp").alias("logprob_sum"),
        F.avg("_lp").alias("avg_logprob"),
    )


def source_divergence(
    df: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group token-distribution drift vs the whole corpus.

    Output: ``(group, n_tokens, entropy, kl_corpus)`` — Shannon entropy
    of the group's unigram distribution and KL(group ‖ corpus), both in
    nats. The pipeline use: a source whose KL spikes is drifting from
    the mix (a scraper broke, a new domain flooded in) — the
    distribution-level complement of per-document LM scoring.

    No smoothing needed: every group token occurs in the corpus by
    construction, so q(t) > 0 wherever p(t) > 0; zero-count terms
    contribute 0 to both sums.

    Scale: one (group, token)-keyed count, a broadcast join of the
    |vocab|-row corpus counts, one group-keyed aggregate.
    """
    pairs = df.select(
        F.col(group_col).alias("grp"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    gcounts = pairs.groupBy("grp", "token").agg(
        F.count("*").cast("long").alias("n")
    )
    corpus = gcounts.groupBy("token").agg(F.sum("n").alias("cn"))
    corpus_total = corpus.agg(F.sum("cn").alias("ct"))
    joined = (
        gcounts.join(F.broadcast(corpus), "token")
        .crossJoin(F.broadcast(corpus_total))
        .withColumn("gt", F.sum("n").over(Window.partitionBy("grp")))
        .withColumn("p", F.col("n") / F.col("gt"))
        .withColumn("q", F.col("cn") / F.col("ct"))
    )
    return joined.groupBy(F.col("grp").alias(group_col)).agg(
        F.first("gt").cast("long").alias("n_tokens"),
        (-F.sum(F.col("p") * F.log("p"))).alias("entropy"),
        F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))).alias("kl_corpus"),
    )
