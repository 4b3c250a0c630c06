"""Sign-LSH contracts (operators/rplsh.py): the md5-derived
hyperplanes make an embedding LSH whose banded bucket keys — and the
candidate pairs they induce — are value-checked against DuckDB, which
no library RNG-based LSH can offer. The plane constants come from the
same Python function on both sides and embed as literals; the dot
folds use the same left-to-right order, so every sign bit is
bit-identical."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.rplsh import random_hyperplanes
from ..sources.loaders import load_table

BITS = 32
BANDS = 4
SEED = 42
DIM = 64


def _planes():
    return random_hyperplanes(DIM, BITS, seed=SEED)


def rp_lsh_buckets_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded sign-LSH keys for every embedding — (id, band, bucket)."""
    from ..operators.rplsh import rp_bands

    return rp_bands(
        load_table(spark, sf_dir, "embeddings"),
        bits=BITS,
        bands=BANDS,
        seed=SEED,
        dim=DIM,
    )


def _dot_sql(row: list[float]) -> str:
    lit = "[" + ", ".join(repr(float(v)) for v in row) + "]::DOUBLE[]"
    return (
        f"list_reduce(list_transform(list_zip(embedding::DOUBLE[], {lit}), "
        "z -> z[1]*z[2]), (a, b) -> a + b)"
    )


def _buckets_sql() -> str:
    planes = _planes()
    per_band = BITS // BANDS
    arms = []
    for b in range(BANDS):
        expr = "0"
        for i in range(per_band):
            bit = f"CAST({_dot_sql(planes[b * per_band + i])} >= 0 AS INTEGER)"
            expr = f"({expr} * 2 + {bit})"
        arms.append(
            f"SELECT vec_id AS id, {b} AS band, CAST({expr} AS BIGINT) AS bucket "
            "FROM embeddings"
        )
    return " UNION ALL ".join(arms)


RP_BUCKETS_SQL = _buckets_sql()


def rp_candidate_pairs_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct same-bucket candidate pairs — the LSH recall set an
    exact cosine verifier would prune."""
    from ..operators.rplsh import rp_candidate_pairs

    return rp_candidate_pairs(
        load_table(spark, sf_dir, "embeddings"),
        bits=BITS,
        bands=BANDS,
        seed=SEED,
    )


RP_PAIRS_SQL = (
    "WITH k AS (" + RP_BUCKETS_SQL + """)
SELECT DISTINCT a.id AS id1, b.id AS id2
FROM k a JOIN k b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.id < b.id"""
)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rp_lsh_buckets_embeddings": rp_lsh_buckets_embeddings,
    "rp_candidate_pairs_embeddings": rp_candidate_pairs_embeddings,
}

ORACLE_SQL: dict[str, str] = {
    "rp_lsh_buckets_embeddings": RP_BUCKETS_SQL,
    "rp_candidate_pairs_embeddings": RP_PAIRS_SQL,
}


MAX_HAMMING = 8


def rp_hamming_pairs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full sign-LSH pipeline: banded candidates verified by packed-
    signature Hamming distance (<= 8 of 32 bits ⇔ angle ≲ π/4)."""
    from ..operators.rplsh import rp_hamming_pairs

    return rp_hamming_pairs(
        load_table(spark, sf_dir, "embeddings"),
        bits=BITS,
        bands=BANDS,
        seed=SEED,
        max_hamming=MAX_HAMMING,
    )


def _sig_sql() -> str:
    planes = _planes()
    expr = "CAST(0 AS BIGINT)"
    for row in planes:
        bit = f"CAST({_dot_sql(row)} >= 0 AS BIGINT)"
        expr = f"({expr} * 2 + {bit})"
    return f"SELECT vec_id AS id, {expr} AS sig FROM embeddings"


RP_HAMMING_SQL = (
    "WITH k AS (" + RP_BUCKETS_SQL + "), cand AS ("
    + """
SELECT DISTINCT a.id AS id1, b.id AS id2
FROM k a JOIN k b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.id < b.id), sigs AS ("""
    + _sig_sql()
    + f""")
SELECT id1, id2, bit_count(xor(s1.sig, s2.sig)) AS hamming
FROM cand
JOIN sigs s1 ON cand.id1 = s1.id
JOIN sigs s2 ON cand.id2 = s2.id
WHERE bit_count(xor(s1.sig, s2.sig)) <= {MAX_HAMMING}"""
)

QUERIES["rp_hamming_pairs_embeddings"] = rp_hamming_pairs_embeddings
ORACLE_SQL["rp_hamming_pairs_embeddings"] = RP_HAMMING_SQL
