"""Snapshot-diff contract queries with DuckDB oracles.

The Spark side classifies via operators/diff.py's md5 content hashes;
the oracle classifies by DIRECT null-safe column comparison
(``IS DISTINCT FROM``) — deliberately a different formulation, so the
check validates the hash-based engine against first principles instead
of mirroring its own md5 math.

The "new snapshot" is derived from the documents table itself with
deterministic edits (drop ``doc_id % 13 = 0`` rows, upper-case the
text of ``doc_id % 7 = 0`` rows) so both engines see identical inputs
without extra fixtures.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.diff import diff_summary, snapshot_diff
from ..sources.loaders import load_table


def _old_new(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 11 != 0)
    new = docs.where(F.col("doc_id") % 13 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.upper(F.col("text"))
        ).otherwise(F.col("text")),
    )
    return old, new


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Added/removed/changed doc_ids between two corpus snapshots —
    the slice incremental dedup/indexing actually consumes."""
    old, new = _old_new(spark, sf_dir)
    return snapshot_diff(old, new, ["doc_id"])


_OLD_NEW_SQL = """
old AS (
  SELECT doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 11 <> 0
),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id % 13 <> 0
),
classified AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text IS DISTINCT FROM n.text
                OR o.lang IS DISTINCT FROM n.lang
                OR o.source IS DISTINCT FROM n.source
                OR o.n_chars IS DISTINCT FROM n.n_chars THEN 'changed'
              ELSE 'unchanged' END AS change
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
"""

CORPUS_SNAPSHOT_DIFF_SQL = f"""
WITH {_OLD_NEW_SQL}
SELECT doc_id, change FROM classified WHERE change <> 'unchanged'
"""


def corpus_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key counts per change class (unchanged included) — the audit
    report a snapshot promotion gate reads."""
    old, new = _old_new(spark, sf_dir)
    return diff_summary(old, new, ["doc_id"])


CORPUS_DIFF_SUMMARY_SQL = f"""
WITH {_OLD_NEW_SQL}
SELECT change, count(*) AS n_keys FROM classified GROUP BY change
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_snapshot_diff": corpus_snapshot_diff,
    "corpus_diff_summary": corpus_diff_summary,
}

ORACLE_SQL: dict[str, str] = {
    "corpus_snapshot_diff": CORPUS_SNAPSHOT_DIFF_SQL,
    "corpus_diff_summary": CORPUS_DIFF_SUMMARY_SQL,
}


_FP_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
    "o_orderdate",
]


def table_fingerprint_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content fingerprint of the orders table
    (operators/diff.py::table_fingerprint): XOR of per-row content
    hashes + exact row/distinct counts — the one-row replica /
    ingest-batch integrity check. Double-typed columns are excluded
    by choice: their string renderings are engine-specific, and a
    fingerprint must never depend on a formatter."""
    from ..operators.diff import table_fingerprint

    return table_fingerprint(
        load_table(spark, sf_dir, "orders"), _FP_COLS
    )


def _fingerprint_sql() -> str:
    parts = " || ".join(
        f"coalesce(md5(CAST({c} AS VARCHAR)), '<null>')" for c in _FP_COLS
    )
    return f"""
WITH h AS (
  SELECT ('0x' || substr(md5({parts}), 1, 15))::BIGINT AS _h
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT _h) AS BIGINT) AS n_distinct,
       bit_xor(_h) AS xor_hash
FROM h
"""


QUERIES["table_fingerprint_orders"] = table_fingerprint_orders
ORACLE_SQL["table_fingerprint_orders"] = _fingerprint_sql()
