"""Text-analysis contract queries (documents table) with DuckDB oracles.

All scoring arithmetic is written with identical operation order on both
engines (see _sql_text.py), so even the floating-point quality score
hash-matches without rounding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources.loaders import load_table
from ._sql_text import (
    sql_alpha_ratio,
    sql_bpe_ish_token_count,
    sql_lang_hits,
    sql_mean_token_len,
    sql_quality_score,
    sql_token_count,
)


def text_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.bpe_ish_token_count("text").alias("n_bpe_tokens"),
        T.mean_token_len("text").alias("mean_token_len"),
        T.alpha_ratio("text").alias("alpha_ratio"),
        T.quality_score("text").alias("quality_score"),
    )


TEXT_STATS_SQL = (
    "SELECT doc_id, "
    f"CAST({sql_token_count('text')} AS INTEGER) AS n_tokens, "
    f"CAST({sql_bpe_ish_token_count('text')} AS INTEGER) AS n_bpe_tokens, "
    f"{sql_mean_token_len('text')} AS mean_token_len, "
    f"{sql_alpha_ratio('text')} AS alpha_ratio, "
    f"{sql_quality_score('text')} AS quality_score "
    "FROM documents"
)


def lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    hits = T.lang_scores("text")
    return df.select(
        "doc_id",
        T.lang_id("text").alias("lang_pred"),
        *[hits[lang].alias(f"hits_{lang}") for lang in sorted(hits)],
    )


def _lang_id_sql() -> str:
    hits = sql_lang_hits("text")
    langs = list(hits)
    case_arms = []
    for lang in langs:
        conds = [f"{hits[lang]} > 0"] + [
            f"{hits[lang]} > {hits[o]}" for o in langs if o != lang
        ]
        case_arms.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(case_arms) + " ELSE 'unknown' END"
    hit_cols = ", ".join(
        f"CAST({hits[lang]} AS INTEGER) AS hits_{lang}" for lang in sorted(langs)
    )
    return f"SELECT doc_id, {case} AS lang_pred, {hit_cols} FROM documents"


LANG_ID_SQL = _lang_id_sql()


def quality_filter_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline-shaped use: keep docs above a quality bar and under a
    token budget — filter + projection only, fully pushdown-friendly."""
    df = load_table(spark, sf_dir, "documents")
    q = T.quality_score("text")
    n = T.token_count("text")
    return (
        df.select("doc_id", "source", q.alias("quality_score"), n.alias("n_tokens"))
        .filter((F.col("quality_score") >= 0.5) & (F.col("n_tokens") <= 80))
    )


QUALITY_FILTER_SQL = (
    "SELECT * FROM ("
    f"SELECT doc_id, source, {sql_quality_score('text')} AS quality_score, "
    f"CAST({sql_token_count('text')} AS INTEGER) AS n_tokens FROM documents) "
    "WHERE quality_score >= 0.5 AND n_tokens <= 80"
)


def source_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health: doc count, avg quality, avg tokens —
    the monitoring aggregation a data pipeline runs per ingest source."""
    df = load_table(spark, sf_dir, "documents")
    return (
        df.select(
            "source",
            T.quality_score("text").alias("q"),
            T.token_count("text").cast("double").alias("n"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.avg("q").alias("avg_quality"),
            F.avg("n").alias("avg_tokens"),
        )
    )


SOURCE_QUALITY_SQL = (
    "SELECT source, count(*) AS n_docs, "
    f"avg({sql_quality_score('text')}) AS avg_quality, "
    f"avg(CAST({sql_token_count('text')} AS DOUBLE)) AS avg_tokens "
    "FROM documents GROUP BY source"
)


def top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most frequent tokens per language tag — explode → count →
    ranked window, the canonical top-k-per-group. Deterministic
    tie-break (count desc, token asc). Scale: token explode shuffles
    (lang, token) pairs with map-side partial counts; the window sees
    only the aggregated counts, never raw tokens."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(T.tokens("text")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("lang", "token", "n", F.col("rank").cast("long").alias("rank"))
    )


def _top_tokens_sql() -> str:
    from ._sql_text import sql_tokens

    return f"""
WITH counts AS (
    SELECT lang, token, count(*) AS n
    FROM (SELECT lang, unnest({sql_tokens("text")}) AS token FROM documents)
    WHERE token != ''
    GROUP BY lang, token
), ranked AS (
    SELECT lang, token, n,
           CAST(row_number() OVER (PARTITION BY lang
                                   ORDER BY n DESC, token ASC) AS BIGINT) AS rank
    FROM counts
)
SELECT lang, token, n, rank FROM ranked WHERE rank <= 5
"""


TOP_TOKENS_SQL = _top_tokens_sql()


def source_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary profile: document count, token occurrences,
    distinct tokens, and type-token ratio (distinct/total — the classic
    lexical-diversity signal; boilerplate-heavy sources sit low).
    Scale: explode shuffles (source, token) with map-side partial
    counts; the distinct count is exact (token vocabulary per source is
    bounded, unlike doc counts) — swap `approx_count_distinct` at
    open-vocabulary web scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", "doc_id", F.explode(T.tokens("text")).alias("token"))
        .groupBy("source")
        .agg(
            F.count_distinct("doc_id").cast("int").alias("n_docs"),
            F.count("*").cast("long").alias("total_tokens"),
            F.count_distinct("token").cast("int").alias("distinct_tokens"),
            (F.count_distinct("token").cast("double") / F.count("*")).alias(
                "type_token_ratio"
            ),
        )
    )


def _vocab_stats_sql() -> str:
    from ._sql_text import sql_tokens

    return f"""
SELECT source,
  CAST(count(DISTINCT doc_id) AS INTEGER) AS n_docs,
  count(*) AS total_tokens,
  CAST(count(DISTINCT token) AS INTEGER) AS distinct_tokens,
  CAST(count(DISTINCT token) AS DOUBLE) / count(*) AS type_token_ratio
FROM (SELECT source, doc_id, unnest({sql_tokens("text")}) AS token
      FROM documents)
GROUP BY source
"""


VOCAB_STATS_SQL = _vocab_stats_sql()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_stats_documents": text_stats_documents,
    "lang_id_documents": lang_id_documents,
    "quality_filter_documents": quality_filter_documents,
    "source_quality_summary": source_quality_summary,
    "top_tokens_per_lang": top_tokens_per_lang,
    "source_vocab_stats": source_vocab_stats,
}

ORACLE_SQL: dict[str, str] = {
    "text_stats_documents": TEXT_STATS_SQL,
    "lang_id_documents": LANG_ID_SQL,
    "quality_filter_documents": QUALITY_FILTER_SQL,
    "source_quality_summary": SOURCE_QUALITY_SQL,
    "top_tokens_per_lang": TOP_TOKENS_SQL,
    "source_vocab_stats": VOCAB_STATS_SQL,
}


def lang_margin_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-id with a CONFIDENCE margin: top stopword-hit score
    minus runner-up per document — the filter knob that separates
    "confidently en" from "barely anything" (margin 0 ⇔ tie ⇔
    lang_id's 'unknown'). Scores sort as (score, lang) structs so the
    tie order is deterministic and mirrored in the oracle's
    row_number."""
    from ._sql_text import sql_lang_hits

    docs = load_table(spark, sf_dir, "documents")
    scores = T.lang_scores(F.col("text"))
    pairs = F.array_sort(
        F.array(
            *[
                F.struct(
                    s.cast("long").alias("hits"), F.lit(lang).alias("lang")
                )
                for lang, s in scores.items()
            ]
        )
    )
    top = F.element_at(pairs, -1)
    second = F.element_at(pairs, -2)
    return docs.select(
        "doc_id",
        T.lang_id(F.col("text")).alias("lang"),
        top["hits"].alias("top_hits"),
        (top["hits"] - second["hits"]).alias("margin"),
    )


def _lang_margin_sql() -> str:
    from ._sql_text import sql_lang_hits
    from ..functions.text import LANG_STOPWORDS

    hits = sql_lang_hits("text")
    arms = " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS lang, CAST({expr} AS BIGINT) AS hits "
        "FROM documents"
        for lang, expr in hits.items()
    )
    # lang_id's strict-argmax semantics: a language wins only with a
    # strictly greater score than every other, else 'unknown'
    langs = list(LANG_STOPWORDS)
    who = " ".join(
        "WHEN "
        + " AND ".join(
            [f"h_{lang} > 0"]
            + [f"h_{lang} > h_{o}" for o in langs if o != lang]
        )
        + f" THEN '{lang}'"
        for lang in langs
    )
    per_doc = ", ".join(
        f"max(CASE WHEN lang = '{lang}' THEN hits END) AS h_{lang}"
        for lang in langs
    )
    return f"""
WITH s AS ({arms}),
ranked AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY hits DESC, lang DESC
         ) AS rn
  FROM s
),
wide AS (
  SELECT doc_id, {per_doc} FROM s GROUP BY doc_id
)
SELECT w.doc_id,
       CASE {who} ELSE 'unknown' END AS lang,
       r1.hits AS top_hits,
       r1.hits - r2.hits AS margin
FROM wide w
JOIN (SELECT doc_id, hits FROM ranked WHERE rn = 1) r1 USING (doc_id)
JOIN (SELECT doc_id, hits FROM ranked WHERE rn = 2) r2 USING (doc_id)
"""


LANG_MARGIN_SQL = _lang_margin_sql()

QUERIES["lang_margin_documents"] = lang_margin_documents
ORACLE_SQL["lang_margin_documents"] = LANG_MARGIN_SQL


def readability_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Flesch reading-ease with its ingredient counts
    (functions/text.py::flesch_reading_ease) — the classic
    readability quality-filter column."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").cast("long").alias("words"),
        T.sentence_count("text").cast("long").alias("sentences"),
        T.syllable_estimate("text").cast("long").alias("syllables"),
        T.flesch_reading_ease("text").alias("flesch"),
    )


def _readability_sql() -> str:
    from ._sql_text import (
        sql_flesch,
        sql_sentences,
        sql_syllables,
        sql_token_count,
    )

    return f"""
SELECT doc_id,
       CAST({sql_token_count('text')} AS BIGINT) AS words,
       CAST({sql_sentences('text')} AS BIGINT) AS sentences,
       CAST({sql_syllables('text')} AS BIGINT) AS syllables,
       {sql_flesch('text')} AS flesch
FROM documents
"""


READABILITY_SQL = _readability_sql()

QUERIES["readability_documents"] = readability_documents
ORACLE_SQL["readability_documents"] = READABILITY_SQL
