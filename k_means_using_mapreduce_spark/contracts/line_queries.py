"""Line-level dedup contract queries (operators/lines.py).

The synthetic corpus is newline-free, so the contracts use the
token-window segmenter (window=3): every 3 consecutive whitespace
tokens form a "line". With the ~30-word test vocabulary this yields a
realistic boilerplate profile at sf0.01 — ~22 windows shared by ≥5
documents — so the frequent-line set is non-trivial but bounded, like
real nav-bar/banner boilerplate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.lines import drop_frequent_lines, frequent_lines, segment_lines
from ..sources.loaders import load_table
from ._sql_text import sql_tokens

_WINDOW = 3
_MIN_DOCS = 5


def _sql_segments(window: int) -> str:
    """DuckDB twin of operators/lines.py::segment_lines(window=k):
    (doc_id, line_no, line) rows, empty docs contributing none."""
    return f"""
toks AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
seg0 AS (SELECT doc_id, t,
                unnest(range(0, CAST(ceil(len(t)/{window}.0) AS BIGINT))) AS gs
         FROM toks),
seg AS (SELECT doc_id, CAST(gs AS INT) AS line_no,
               array_to_string(t[gs*{window}+1 : gs*{window}+{window}], ' ') AS line
        FROM seg0)
"""


def frequent_lines_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    segs = segment_lines(docs, window=_WINDOW)
    return frequent_lines(segs, min_docs=_MIN_DOCS).select(
        "line", F.col("n_docs").cast("int").alias("n_docs")
    )


FREQUENT_LINES_SQL = f"""
WITH {_sql_segments(_WINDOW)}
SELECT line, CAST(count(DISTINCT doc_id) AS INTEGER) AS n_docs
FROM seg GROUP BY line HAVING count(DISTINCT doc_id) >= {_MIN_DOCS}
"""


def line_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return drop_frequent_lines(
        docs, window=_WINDOW, min_docs=_MIN_DOCS
    ).orderBy("doc_id")


LINE_DEDUP_SQL = f"""
WITH {_sql_segments(_WINDOW)},
freq AS (
  SELECT line FROM seg GROUP BY line
  HAVING count(DISTINCT doc_id) >= {_MIN_DOCS}
),
marked AS (
  SELECT s.doc_id, s.line_no, s.line,
         (f.line IS NOT NULL) AS is_boiler
  FROM seg s LEFT JOIN freq f ON s.line = f.line
)
, agg AS (
  SELECT doc_id,
    CAST(count(*) AS INTEGER) AS n_lines,
    CAST(sum(CASE WHEN NOT is_boiler THEN 1 ELSE 0 END) AS INTEGER) AS kept_lines,
    CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS INTEGER) AS dropped_lines,
    coalesce(string_agg(CASE WHEN NOT is_boiler THEN line END, ' '
                        ORDER BY line_no), '') AS cleaned_text
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(a.n_lines, 0) AS n_lines,
  coalesce(a.kept_lines, 0) AS kept_lines,
  coalesce(a.dropped_lines, 0) AS dropped_lines,
  coalesce(a.cleaned_text, '') AS cleaned_text
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "frequent_lines_documents": frequent_lines_documents,
    "line_dedup_documents": line_dedup_documents,
}

ORACLE_SQL: dict[str, str] = {
    "frequent_lines_documents": FREQUENT_LINES_SQL,
    "line_dedup_documents": LINE_DEDUP_SQL,
}
