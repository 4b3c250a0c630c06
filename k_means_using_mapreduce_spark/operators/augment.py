"""Deterministic text augmentation for training-data pipelines.

Augmentation (EDA-style token dropout — Wei & Zou 2019) is the one
corpus WRITE the cleaning/dedup/selection read-path family doesn't
cover: emit perturbed copies of documents to harden downstream models.
Randomness is the engine's hash-coin doctrine (sampling.py): each
token's fate is ``md5(doc_id ':' position)`` — per-document AND
per-position deterministic, so retries, partitionings, and engines all
drop the same tokens, and the oracle replays the coin exactly.

Everything is JVM-side array/lambda expressions (F.filter with the
index lambda); no UDF, no shuffle — augmentation is embarrassingly
row-local.

Reference scope note: the reference engine (master.py:27-150) is
K-Means only; augmentation is extension scope per the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .dedup import md5_int60


def _coin(doc_id: Column, pos_1based: Column) -> Column:
    """Integer coin in [0, 100) from md5(doc_id ':' pos) — the shared
    60-bit hash idiom (dedup.md5_int60), 1-based positions shared
    with the oracle (DuckDB list lambdas index from 1)."""
    return md5_int60(
        F.concat(
            doc_id.cast("string"),
            F.lit(":"),
            pos_1based.cast("string"),
        )
    ) % 100


def token_dropout(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_pct: int = 10,
) -> DataFrame:
    """Deterministic token dropout: each (lowercased, whitespace)
    token survives iff its hash coin lands >= ``drop_pct`` — an exact
    ``drop_pct``% expected dropout with zero randomness.

    Returns one row per document:
    ``(doc_id, n_tokens, n_kept, aug_md5)`` where ``aug_md5`` hashes
    the space-joined surviving tokens — the full augmented text is a
    trivial ``array_join`` away, but the contract gates content
    through the hash so row payloads stay small.

    Scale shape: one narrow projection per document (split + indexed
    lambda filter + md5), no shuffle, no UDF — the cheapest possible
    corpus write.
    """
    if not 0 < drop_pct < 100:
        raise ValueError(
            f"drop_pct must be in (0, 100), got {drop_pct}"
        )
    did = F.col(id_col)
    toks = tokens(F.col(text_col))
    kept = F.filter(
        toks,
        lambda t, i: _coin(did, i + F.lit(1)) >= F.lit(int(drop_pct)),
    )
    aug = F.array_join(kept, " ")
    return df.select(
        did.alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("n_kept"),
        F.md5(aug).alias("aug_md5"),
    )


def dropout_summary(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_pct: int = 10,
) -> DataFrame:
    """Corpus-level accounting for :func:`token_dropout`: one row
    ``(n_docs, tokens_before, tokens_after, drop_rate)`` — the
    sanity check that the realized rate sits at ``drop_pct``%."""
    per = token_dropout(
        df, id_col=id_col, text_col=text_col, drop_pct=drop_pct
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_before"),
        F.sum("n_kept").alias("tokens_after"),
        (
            F.lit(1.0)
            - F.sum("n_kept").cast("double")
            / F.sum("n_tokens").cast("double")
        ).alias("drop_rate"),
    )
