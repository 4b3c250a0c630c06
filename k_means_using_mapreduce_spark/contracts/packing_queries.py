"""Chunking / packing contract queries (documents table) with DuckDB
oracles. See operators/packing.py; all outputs are integers or strings,
so hashes match exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.packing import chunk_documents, pack_documents, pack_summary
from ..sources.loaders import load_table
from ._sql_text import sql_token_count, sql_tokens

CHUNK_TOKENS = 32
PACK_BUDGET = 256
PACK_SHARDS = 8


def chunk_documents_32(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=CHUNK_TOKENS
    )


CHUNK_SQL = f"""
WITH toked AS (
  SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
  WHERE len({sql_tokens('text')}) > 0
), indexed AS (
  SELECT doc_id, toks,
         unnest(generate_series(
             1, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS INTEGER))) AS i
  FROM toked
), chunks AS (
  SELECT doc_id,
         i - 1 AS chunk_seq,
         array_to_string(toks[(i - 1) * {CHUNK_TOKENS} + 1 :
                              i * {CHUNK_TOKENS}], ' ') AS chunk_text
  FROM indexed
)
SELECT doc_id, CAST(chunk_seq AS INTEGER) AS chunk_seq, chunk_text,
       CAST({sql_token_count('chunk_text')} AS INTEGER) AS n_tokens
FROM chunks
"""


def pack_documents_256(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_documents(
        load_table(spark, sf_dir, "documents"),
        budget_tokens=PACK_BUDGET,
        shards=PACK_SHARDS,
    )


PACK_SQL = f"""
WITH sized AS (
  SELECT doc_id,
         CAST({sql_token_count('text')} AS INTEGER) AS n_tokens,
         CAST(doc_id % {PACK_SHARDS} AS INTEGER) AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(floor(coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         / {PACK_BUDGET}) AS INTEGER) AS bin,
       n_tokens
FROM sized
"""


def pack_summary_256(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_summary(
        pack_documents(
            load_table(spark, sf_dir, "documents"),
            budget_tokens=PACK_BUDGET,
            shards=PACK_SHARDS,
        )
    )


PACK_SUMMARY_SQL = f"""
WITH packed AS ({PACK_SQL})
SELECT shard, bin, CAST(count(*) AS INTEGER) AS n_docs,
       CAST(sum(n_tokens) AS INTEGER) AS total_tokens
FROM packed GROUP BY shard, bin
"""




def epoch_shuffle_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded epoch permutation of the corpus (seed=7, 4 shards):
    (doc_id, shard, epoch_pos) — byte-identical on every run/retry, so
    the oracle can re-derive the whole training order."""
    from ..operators.packing import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(docs, seed=7, shards=4)


EPOCH_SHUFFLE_SQL = """
WITH keyed AS (
  SELECT doc_id,
         md5(concat_ws(chr(31), '7', CAST(doc_id AS VARCHAR))) AS ek
  FROM documents
), sharded AS (
  SELECT doc_id, ek,
         CAST(('0x' || substr(ek, 1, 8))::BIGINT % 4 AS INTEGER) AS shard
  FROM keyed
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY ek) AS INTEGER)
         AS epoch_pos
FROM sharded
"""

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "chunk_documents_32": chunk_documents_32,
    "pack_documents_256": pack_documents_256,
    "pack_summary_256": pack_summary_256,
    "epoch_shuffle_documents": epoch_shuffle_documents,
}

ORACLE_SQL: dict[str, str] = {
    "chunk_documents_32": CHUNK_SQL,
    "pack_documents_256": PACK_SQL,
    "pack_summary_256": PACK_SUMMARY_SQL,
    "epoch_shuffle_documents": EPOCH_SHUFFLE_SQL,
}
