"""Feature-encoding contracts (operators/encode.py): smoothed target
encoding (fit table + leakage-aware leave-one-out application) and
categorical mutual information."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from ._sql_text import sql_tokens

ALPHA = 10.0


def target_encoding_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit table: smoothed mean account balance per market segment."""
    from ..operators.encode import target_encode

    return target_encode(
        load_table(spark, sf_dir, "customer"),
        "c_mktsegment",
        "c_acctbal",
        alpha=ALPHA,
    )


TARGET_ENCODING_SQL = f"""
WITH p AS (
  SELECT avg(CAST(c_acctbal AS DOUBLE)) AS prior FROM customer
  WHERE c_acctbal IS NOT NULL
)
SELECT c_mktsegment AS category, CAST(count(*) AS BIGINT) AS n,
       (sum(CAST(c_acctbal AS DOUBLE)) + {ALPHA} * prior)
         / (count(*) + {ALPHA}) AS encoding
FROM customer CROSS JOIN p
WHERE c_acctbal IS NOT NULL
GROUP BY c_mktsegment, prior
"""


def loo_encoding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out smoothed value-encoding of event types, applied
    to the very rows the statistic comes from — each row's own label
    subtracted (the target-leakage defense)."""
    from ..operators.encode import target_encode_loo

    out = target_encode_loo(
        load_table(spark, sf_dir, "events"), "event_type", "value", alpha=ALPHA
    )
    return out.select("event_id", "event_type", "value", "loo_encoding")


LOO_ENCODING_SQL = f"""
WITH s AS (
  SELECT event_type AS cat, sum(CAST(value AS DOUBLE)) AS sv,
         CAST(count(*) AS BIGINT) AS nv
  FROM events WHERE value IS NOT NULL GROUP BY 1
), p AS (
  SELECT avg(CAST(value AS DOUBLE)) AS prior FROM events
)
SELECT event_id, event_type, value,
       (coalesce(sv, 0) - CASE WHEN value IS NOT NULL THEN CAST(value AS DOUBLE)
                               ELSE 0 END
          + {ALPHA} * prior)
       / (coalesce(nv, 0) - CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END
          + {ALPHA}) AS loo_encoding
FROM events LEFT JOIN s ON events.event_type = s.cat CROSS JOIN p
"""


def lang_source_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between document language and source — does
    provenance already determine language? (0 = independent)."""
    from ..operators.encode import mutual_information

    return mutual_information(load_table(spark, sf_dir, "documents"), "lang", "source")


LANG_SOURCE_MI_SQL = """
WITH joint AS (
  SELECT lang AS x, source AS y, CAST(count(*) AS BIGINT) AS nxy
  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY 1, 2
), mx AS (
  SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM joint GROUP BY 1
), my AS (
  SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM joint GROUP BY 1
), tot AS (
  SELECT CAST(sum(nxy) AS BIGINT) AS n FROM joint
)
SELECT sum((CAST(nxy AS DOUBLE) / n)
           * ln((CAST(nxy AS DOUBLE) * n) / (CAST(nx AS DOUBLE) * ny))) AS mi,
       any_value(n) AS n
FROM joint JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "target_encoding_mktsegment": target_encoding_mktsegment,
    "loo_encoding_events": loo_encoding_events,
    "lang_source_mi": lang_source_mi,
}

ORACLE_SQL: dict[str, str] = {
    "target_encoding_mktsegment": TARGET_ENCODING_SQL,
    "loo_encoding_events": LOO_ENCODING_SQL,
    "lang_source_mi": LANG_SOURCE_MI_SQL,
}


QN_GRID = 200


def quantile_normalized_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality scores rank-mapped onto the global quality
    distribution (operators/encode.py::quantile_normalize)."""
    from ..functions.text import quality_score
    from ..operators.encode import quantile_normalize

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", quality_score("text").alias("score")
    )
    out = quantile_normalize(
        docs, "score", "source", "doc_id", grid=QN_GRID
    )
    return out.select("doc_id", "source", "score", "normalized")


def _qn_sql() -> str:
    from ._sql_text import sql_quality_score

    pcts = ", ".join(repr(i / QN_GRID) for i in range(QN_GRID + 1))
    return f"""
WITH scored AS (
  SELECT doc_id, source, {sql_quality_score('text')} AS score FROM documents
),
gq AS (SELECT quantile_cont(score, [{pcts}]) AS qs FROM scored),
grid AS (
  SELECT unnest(qs) AS gq_v, generate_subscripts(qs, 1) - 1 AS gq_i FROM gq
),
ranked AS (
  SELECT doc_id, source, score,
    CAST(round(percent_rank() OVER (
      PARTITION BY source ORDER BY score, doc_id) * {QN_GRID}) AS INTEGER)
      AS q
  FROM scored
)
SELECT doc_id, source, score, gq_v AS normalized
FROM ranked JOIN grid ON gq_i = q
"""


QUERIES["quantile_normalized_quality"] = quantile_normalized_quality
ORACLE_SQL["quantile_normalized_quality"] = _qn_sql()


WOE_ALPHA = 0.5


def woe_source_english(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence of document source against the is-English
    label — which provenances predict English content."""
    from ..operators.encode import woe_table

    docs = load_table(spark, sf_dir, "documents").select(
        "source", (F.col("lang") == "en").cast("int").alias("y")
    )
    return woe_table(docs, "source", "y", alpha=WOE_ALPHA)


WOE_SQL = f"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(count(*) - sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              AS BIGINT) AS neg
  FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL
  GROUP BY 1
),
tot AS (
  SELECT CAST(sum(pos) AS DOUBLE) AS pt, CAST(sum(neg) AS DOUBLE) AS nt,
         CAST(count(*) AS DOUBLE) AS c
  FROM per
)
SELECT source, n, pos, neg,
       ln(((pos + {WOE_ALPHA}) / (pt + {WOE_ALPHA} * c))
          / ((neg + {WOE_ALPHA}) / (nt + {WOE_ALPHA} * c))) AS woe,
       ((pos + {WOE_ALPHA}) / (pt + {WOE_ALPHA} * c)
         - (neg + {WOE_ALPHA}) / (nt + {WOE_ALPHA} * c))
       * ln(((pos + {WOE_ALPHA}) / (pt + {WOE_ALPHA} * c))
            / ((neg + {WOE_ALPHA}) / (nt + {WOE_ALPHA} * c))) AS iv_term
FROM per CROSS JOIN tot
"""

QUERIES["woe_source_english"] = woe_source_english
ORACLE_SQL["woe_source_english"] = WOE_SQL


def hashed_features_profile_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Signed feature hashing (64 dims) of the documents corpus,
    profiled per dimension — bucket load and sign cancellation."""
    from ..operators.encode import hashed_corpus_profile, hashed_features

    docs = load_table(spark, sf_dir, "documents")
    return hashed_corpus_profile(hashed_features(docs, "text", dims=64))


HASHED_FEATURES_SQL = f"""
WITH tok AS (
  SELECT id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
  FROM (
    SELECT doc_id AS id,
           unnest({sql_tokens('text')}) AS t
    FROM documents
  )
),
coo AS (
  SELECT id, CAST(h % 64 AS INTEGER) AS dim,
         CAST(((h // 64) % 2) * 2 - 1 AS BIGINT) AS sign
  FROM tok
),
feat AS (
  SELECT id, dim, CAST(sum(sign) AS BIGINT) AS weight
  FROM coo GROUP BY 1, 2
)
SELECT dim,
  CAST(count(DISTINCT id) AS BIGINT) AS docs,
  CAST(count(*) AS BIGINT) AS entries,
  CAST(sum(weight) AS BIGINT) AS total_weight,
  CAST(sum(abs(weight)) AS BIGINT) AS abs_weight
FROM feat GROUP BY dim
"""

QUERIES["hashed_features_profile_documents"] = hashed_features_profile_documents
ORACLE_SQL["hashed_features_profile_documents"] = HASHED_FEATURES_SQL
