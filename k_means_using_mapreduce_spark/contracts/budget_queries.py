"""Token-budget allocation contract (operators/budget.py): greedy
water-filling of a fixed token budget across sources ranked by mean
document length (an exact-rational score — integer sum / integer
count — so the ranking is bit-identical across engines; a float mean
of doubles would be sum-order-dependent and could flip adjacent
ranks)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..operators.budget import allocate_budget
from ..sources.loaders import load_table
from ._sql_text import sql_token_count

_BUDGET = 15000.0
_MAX_EPOCHS = 2.0


def source_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.sum(token_count("text")).alias("tokens"),
        (
            F.sum(token_count("text")).cast("double") / F.count("*")
        ).alias("quality"),
    )
    return allocate_budget(
        stats, total_budget=_BUDGET, max_epochs=_MAX_EPOCHS
    )


SOURCE_BUDGET_SQL = f"""
WITH stats AS (
  SELECT source,
    CAST(sum({sql_token_count('text')}) AS BIGINT) AS tokens,
    CAST(sum({sql_token_count('text')}) AS DOUBLE) / count(*) AS score
  FROM documents GROUP BY 1
), cum AS (
  SELECT source,
    CAST(tokens AS DOUBLE) AS tokens,
    score,
    CAST(tokens AS DOUBLE) * {_MAX_EPOCHS!r} AS capacity,
    sum(CAST(tokens AS DOUBLE) * {_MAX_EPOCHS!r}) OVER (
      ORDER BY score DESC, source
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) - CAST(tokens AS DOUBLE) * {_MAX_EPOCHS!r} AS cum_before
  FROM stats
)
SELECT source, tokens, score, capacity, cum_before,
  greatest(0.0, least(capacity, {_BUDGET!r} - cum_before)) AS alloc,
  CASE WHEN tokens > 0
       THEN greatest(0.0, least(capacity, {_BUDGET!r} - cum_before))
            / tokens
       ELSE 0.0 END AS epochs,
  greatest(0.0, least(capacity, {_BUDGET!r} - cum_before)) < capacity
    AS exhausted
FROM cum
"""

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "source_budget_plan": source_budget_plan,
}

ORACLE_SQL: dict[str, str] = {
    "source_budget_plan": SOURCE_BUDGET_SQL,
}


_RAKE_SOURCES = [f"src{i}" for i in range(20)]
_RAKE_LANGS = ["de", "en", "es", "fr", "zh"]
_RAKE_ITERS = 5


def rake_source_lang_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPF-raked cell weights making documents uniform by source AND
    by language simultaneously (operators/budget.py::ipf_rake_weights,
    5 sweeps) — the two-axis mixture plan."""
    from ..operators.budget import ipf_rake_weights

    docs = load_table(spark, sf_dir, "documents")
    return ipf_rake_weights(
        docs,
        "source",
        "lang",
        row_targets={s: 1.0 / len(_RAKE_SOURCES) for s in _RAKE_SOURCES},
        col_targets={l: 1.0 / len(_RAKE_LANGS) for l in _RAKE_LANGS},
        iters=_RAKE_ITERS,
    )


def _rake_sql() -> str:
    rt = 1.0 / len(_RAKE_SOURCES)
    ct = 1.0 / len(_RAKE_LANGS)
    srcs = ", ".join(f"'{s}'" for s in _RAKE_SOURCES)
    langs = ", ".join(f"'{l}'" for l in _RAKE_LANGS)
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT source AS r, lang AS c, CAST(count(*) AS DOUBLE) AS n, 1.0 AS w
  FROM documents
  WHERE source IN ({srcs}) AND lang IN ({langs})
  GROUP BY 1, 2
)"""
    ]
    prev = "w0"
    for j in range(1, _RAKE_ITERS + 1):
        parts.append(f"""wr{j} AS MATERIALIZED (
  SELECT r, c, n,
    w * ({rt!r} * sum(n * w) OVER ()) / sum(n * w) OVER (PARTITION BY r) AS w
  FROM {prev}
)""")
        parts.append(f"""w{j} AS MATERIALIZED (
  SELECT r, c, n,
    w * ({ct!r} * sum(n * w) OVER ()) / sum(n * w) OVER (PARTITION BY c) AS w
  FROM wr{j}
)""")
        prev = f"w{j}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT r AS source, c AS lang, CAST(n AS BIGINT) AS n, w AS weight
FROM {prev}
"""
    )


QUERIES["rake_source_lang_documents"] = rake_source_lang_documents
ORACLE_SQL["rake_source_lang_documents"] = _rake_sql()
