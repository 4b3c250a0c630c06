"""Multimodal contract queries — the binary-column plumbing, oracle-
checked.

The real decode kernels are stubbed (no codecs in the container — see
operators/multimodal.py), but the Spark-side machinery a multimodal
pipeline needs is exercised against a DuckDB oracle here by deriving a
deterministic binary payload from the documents table: utf-8 bytes flow
through an Arrow-batched ``mapInPandas`` kernel (python ``hashlib``/
``len`` per payload) and must agree with DuckDB's ``md5``/
``octet_length`` on the same bytes — proving the binary column, batch
iteration, UDF schema, and metadata aggregation are all faithful.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table


def media_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source asset stats over a binary payload column, computed by
    an Arrow-batched pandas kernel (the multimodal decode path with a
    hash standing in for the codec)."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("asset_id"),
        "source",
        F.encode("text", "utf-8").alias("payload"),
    )

    def gen(batches: "Iterator") -> "Iterator":
        import hashlib

        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "source": pdf["source"],
                    "n_bytes": pdf["payload"].map(len),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    feats = media.mapInPandas(
        gen, "asset_id long, source string, n_bytes int, digest string"
    )
    return feats.groupBy("source").agg(
        F.count("*").alias("n_assets"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.count_distinct("digest").alias("distinct_payloads"),
    )


MEDIA_BINARY_STATS_SQL = """
SELECT source, count(*) AS n_assets,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       count(DISTINCT md5(text)) AS distinct_payloads
FROM documents
GROUP BY source
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "media_binary_stats": media_binary_stats,
}

ORACLE_SQL: dict[str, str] = {
    "media_binary_stats": MEDIA_BINARY_STATS_SQL,
}
