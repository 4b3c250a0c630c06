"""DSIR data-selection contracts (operators/selection.py): hashed
n-gram importance log-ratio model, per-document importance weights,
and deterministic Gumbel top-k resampling — target = English
documents, raw = the whole corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from ._sql_text import sql_shingles

BUCKETS = 256
ALPHA = 1.0
K = 100
SEED = 0

#: grams = unigrams + bigrams of the house tokenizer (multiplicity
#: kept), mirroring operators/selection.py::doc_gram_buckets.
_GRAMS = f"list_concat({sql_shingles('text', 1)}, {sql_shingles('text', 2)})"
_BUCKET = f"(('0x' || substr(md5(gram), 1, 15))::BIGINT % {BUCKETS})"

_RATIO_CTE = f"""
WITH tg AS (
  SELECT {_BUCKET} AS bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({_GRAMS}) AS gram FROM documents WHERE lang = 'en')
  GROUP BY 1
), rg AS (
  SELECT {_BUCKET} AS bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({_GRAMS}) AS gram FROM documents)
  GROUP BY 1
), grid AS (SELECT range AS bucket FROM range({BUCKETS})),
dense AS (
  SELECT grid.bucket,
         coalesce(tg.cnt, 0) AS target_cnt,
         coalesce(rg.cnt, 0) AS raw_cnt
  FROM grid LEFT JOIN tg USING (bucket) LEFT JOIN rg USING (bucket)
), tot AS (
  SELECT sum(CAST(target_cnt AS DOUBLE)) AS tt,
         sum(CAST(raw_cnt AS DOUBLE)) AS tr
  FROM dense
), ratio AS (
  SELECT bucket, target_cnt, raw_cnt,
         ln((target_cnt + {ALPHA}) / (tt + {ALPHA * BUCKETS}))
           - ln((raw_cnt + {ALPHA}) / (tr + {ALPHA * BUCKETS})) AS log_ratio
  FROM dense CROSS JOIN tot
)
"""


def dsir_log_ratio_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fitted DSIR model itself: all 256 hashed-gram buckets with
    target/raw counts and the smoothed importance log-ratio."""
    from ..operators.selection import dsir_log_ratio

    docs = load_table(spark, sf_dir, "documents")
    return dsir_log_ratio(
        docs.where(F.col("lang") == "en"), docs, buckets=BUCKETS, alpha=ALPHA
    )


DSIR_LOG_RATIO_SQL = _RATIO_CTE + "SELECT * FROM ratio"


def _weights_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selection import dsir_weights_fused

    docs = load_table(spark, sf_dir, "documents")
    # fused path: same math as dsir_log_ratio + dsir_log_weights (the
    # two-frame composition stays contract-checked via
    # dsir_log_ratio_documents), but the gram pipeline runs once
    return dsir_weights_fused(
        docs, F.col("lang") == "en", buckets=BUCKETS, alpha=ALPHA
    )


def dsir_weights_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document importance log-weight Σ log-ratio[bucket(gram)] —
    high = looks like the English target, low = out-of-distribution."""
    return _weights_df(spark, sf_dir)


_WEIGHTS_CTE = (
    _RATIO_CTE
    + f""",
per_gram AS (
  SELECT doc_id, {_BUCKET} AS bucket
  FROM (SELECT doc_id, unnest({_GRAMS}) AS gram FROM documents)
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         sum(log_ratio) AS log_weight
  FROM per_gram JOIN ratio USING (bucket)
  GROUP BY 1
), weights AS (
  SELECT d.doc_id,
         coalesce(agg.n_grams, 0) AS n_grams,
         coalesce(agg.log_weight, 0.0) AS log_weight
  FROM documents d LEFT JOIN agg USING (doc_id)
)
"""
)

DSIR_WEIGHTS_SQL = _WEIGHTS_CTE + "SELECT * FROM weights"


def dsir_select_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel top-100 importance resample of the corpus toward the
    English target — the rows a DSIR-curated pretraining shard keeps."""
    from ..operators.selection import dsir_resample

    return dsir_resample(_weights_df(spark, sf_dir), k=K, seed=SEED)


DSIR_SELECT_SQL = (
    _WEIGHTS_CTE
    + f"""
SELECT doc_id, n_grams, log_weight, resample_key FROM (
  SELECT *,
    row_number() OVER (ORDER BY resample_key DESC, doc_id) AS rk
  FROM (
    SELECT *,
      log_weight / 1.0 - ln(-ln(
        ((('0x' || substr(md5('{SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15))
           ::BIGINT + 0.5) / {float(1 << 60)})
      )) AS resample_key
    FROM weights
  )
) WHERE rk <= {K}
"""
)


QUERIES = {
    "dsir_log_ratio_documents": dsir_log_ratio_documents,
    "dsir_weights_documents": dsir_weights_documents,
    "dsir_select_documents": dsir_select_documents,
}

ORACLE_SQL = {
    "dsir_log_ratio_documents": DSIR_LOG_RATIO_SQL,
    "dsir_weights_documents": DSIR_WEIGHTS_SQL,
    "dsir_select_documents": DSIR_SELECT_SQL,
}


def source_quality_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out quality valuation
    (operators/selection.py::source_ablation): would dropping a source
    raise the corpus mean quality score?"""
    from ..functions.text import quality_score
    from ..operators.selection import source_ablation

    docs = load_table(spark, sf_dir, "documents")
    return source_ablation(
        docs, "source", quality_score("text"), metric_name="quality"
    )


def _ablation_sql() -> str:
    from ._sql_text import sql_quality_score

    q = sql_quality_score("text")
    return f"""
WITH per AS (
  SELECT source AS grp, CAST(count(*) AS DOUBLE) AS n,
         sum({q}) AS s
  FROM documents WHERE source IS NOT NULL AND ({q}) IS NOT NULL
  GROUP BY 1
), tot AS (SELECT sum(n) AS tn, sum(s) AS ts FROM per)
SELECT grp AS source, CAST(n AS BIGINT) AS n,
  s / n AS quality_in,
  (ts - s) / nullif(tn - n, 0.0) AS quality_rest,
  (ts - s) / nullif(tn - n, 0.0) - ts / tn AS delta,
  ts / tn AS quality_global
FROM per CROSS JOIN tot
"""


QUERIES["source_quality_ablation"] = source_quality_ablation
ORACLE_SQL["source_quality_ablation"] = _ablation_sql()
