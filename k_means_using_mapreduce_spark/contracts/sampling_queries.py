"""Deterministic-sampling contract queries with DuckDB oracles.

The md5-bucket expressions here are the engine-portable twin of
operators/sampling.py (same first-15-hex-chars → int64 → mod math);
see that module's docstring for why hash sampling (not rand) is the
only defensible sampler at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import hash_sample, train_test_split
from ..sources.loaders import load_table


def documents_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample of documents by doc_id hash."""
    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", keep=10, out_of=100).select(
        "doc_id", "lang", "source", "n_chars"
    )


DOCUMENTS_HASH_SAMPLE_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 10
"""


def documents_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split (20% test) summarized per (split, lang) —
    proves the partition is disjoint, exhaustive, and deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    split = train_test_split(docs, "doc_id", test_pct=20)
    return split.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


DOCUMENTS_SPLIT_SUMMARY_SQL = """
SELECT CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % 100 < 20
            THEN 'test' ELSE 'train' END AS split,
       lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1, 2
"""



STRATA_RATES = {"src0": 100, "src1": 50, "src2": 25}
STRATA_DEFAULT = 10


def stratified_sample_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source survivor counts under stratified hash sampling —
    the training-data-mixture op (keep all of src0, half of src1, a
    quarter of src2, 10% elsewhere), deterministic by doc_id hash."""
    from ..operators.sampling import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_hash_sample(
        docs, "doc_id", "source", STRATA_RATES, default_keep=STRATA_DEFAULT
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"), F.min("doc_id").alias("first_doc")
    )


_STRATA_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(STRATA_RATES.items()))
    + f" ELSE {STRATA_DEFAULT} END"
)

STRATIFIED_SAMPLE_SQL = f"""
SELECT source, count(*) AS n_kept, min(doc_id) AS first_doc
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100
      < {_STRATA_CASE}
GROUP BY source
"""


def weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 documents per source, sampled WITHOUT replacement with
    probability proportional to n_chars (A-ES exponential race,
    deterministic by doc_id md5) — the quality-weighted mixture
    sampler."""
    from ..operators.sampling import weighted_sample_per_group

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample_per_group(
        docs, "source", "doc_id", "n_chars", k=3
    ).select("doc_id", "source", "n_chars")


# same arithmetic order as the Spark side: int60 -> double, + 1.0,
# / 2^60 (exactly representable), ln, / weight
WEIGHTED_SAMPLE_SQL = """
WITH scored AS (
  SELECT doc_id, source, n_chars,
         ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             + 1.0) / 1152921504606846976.0)
           / CAST(n_chars AS DOUBLE) AS p
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id, source, n_chars
FROM (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY p DESC, doc_id) AS rk
      FROM scored)
WHERE rk <= 3
"""




def correlated_sample_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-consistency of hash sampling: a 10% key-sample of orders
    joined to the SAME 10% key-sample of lineitem is a 10% sample of
    the join (not 1% — both sides keep exactly the same orderkeys).
    One row: joined line count + decimal-exact revenue."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o_s = hash_sample(orders, "o_orderkey", keep=10)
    l_s = hash_sample(li, "l_orderkey", keep=10)
    joined = o_s.join(l_s, o_s["o_orderkey"] == l_s["l_orderkey"])
    return joined.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue"),
    )


_KEY10 = (
    "('0x' || substr(md5(CAST({k} AS VARCHAR)), 1, 15))::BIGINT % 100 < 10"
)

CORRELATED_SAMPLE_SQL = f"""
SELECT count(*) AS n_lines,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM (SELECT o_orderkey FROM orders WHERE {_KEY10.format(k='o_orderkey')}) o
JOIN (SELECT l_orderkey, l_extendedprice FROM lineitem
      WHERE {_KEY10.format(k='l_orderkey')}) l
  ON o.o_orderkey = l.l_orderkey
"""

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "documents_hash_sample": documents_hash_sample,
    "documents_split_summary": documents_split_summary,
    "stratified_sample_summary": stratified_sample_summary,
    "weighted_sample_documents": weighted_sample_documents,
    "correlated_sample_join": correlated_sample_join,
}

ORACLE_SQL: dict[str, str] = {
    "documents_hash_sample": DOCUMENTS_HASH_SAMPLE_SQL,
    "documents_split_summary": DOCUMENTS_SPLIT_SUMMARY_SQL,
    "stratified_sample_summary": STRATIFIED_SAMPLE_SQL,
    "weighted_sample_documents": WEIGHTED_SAMPLE_SQL,
    "correlated_sample_join": CORRELATED_SAMPLE_SQL,
}


def source_coherent_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance-coherent train/test split: the hash key is SOURCE,
    not doc_id, so every document of a source lands in the same split
    — the no-leakage rule for eval sets (near-duplicate documents
    cluster within sources; a doc-level split would leak them across
    the boundary). Output proves coherence: per (split, source) counts
    — a source appearing under both splits would show up as two rows."""
    docs = load_table(spark, sf_dir, "documents")
    split = train_test_split(docs, "source", test_pct=25)
    return split.groupBy("split", "source").agg(F.count("*").alias("n_docs"))


SOURCE_COHERENT_SPLIT_SQL = """
SELECT CASE WHEN ('0x' || substr(md5(source), 1, 15))::BIGINT % 100 < 25
            THEN 'test' ELSE 'train' END AS split,
       source, count(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""

QUERIES["source_coherent_split_summary"] = source_coherent_split_summary
ORACLE_SQL["source_coherent_split_summary"] = SOURCE_COHERENT_SPLIT_SQL


NEG_K = 4


def negative_pairs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-ring negative sampling over embedding ids — each vector's
    k deterministic uniform negatives (operators/sampling.py::
    hash_ring_negatives)."""
    from ..operators.sampling import hash_ring_negatives

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    return hash_ring_negatives(emb, "vec_id", k=NEG_K)


NEGATIVES_SQL = f"""
WITH ranked AS (
  SELECT vec_id AS id,
    row_number() OVER (
      ORDER BY ('0x' || substr(md5('ring:' || CAST(vec_id AS VARCHAR)),
                               1, 15))::BIGINT, vec_id) AS rn
  FROM embeddings
),
tot AS (SELECT count(*) AS n FROM ranked),
slots AS (SELECT unnest(range(1, {NEG_K} + 1)) AS slot),
left_side AS (
  SELECT id, CAST(slot AS INTEGER) AS slot,
         (rn + slot - 1) % n + 1 AS rn_b
  FROM ranked, tot, slots
)
SELECT l.id, l.slot, r.id AS neg_id
FROM left_side l JOIN ranked r ON r.rn = l.rn_b
WHERE l.id <> r.id
"""

QUERIES["negative_pairs_embeddings"] = negative_pairs_embeddings
ORACLE_SQL["negative_pairs_embeddings"] = NEGATIVES_SQL


_NEYMAN_N = 1000


def neyman_allocation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a 1000-row sample budget across
    event types by value variability
    (operators/sampling.py::neyman_allocation), next to the
    proportional allocation so the design gain is visible."""
    from ..operators.sampling import neyman_allocation

    return neyman_allocation(
        load_table(spark, sf_dir, "events"),
        "event_type",
        "value",
        total_n=_NEYMAN_N,
    )


NEYMAN_SQL = f"""
WITH per AS (
  SELECT event_type AS stratum,
         CAST(count(*) AS DOUBLE) AS n,
         sum(value) AS s, sum(value * value) AS ss
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
),
std AS (
  SELECT stratum, n,
    CASE WHEN n > 1.0
         THEN sqrt(greatest((ss - s * s / n) / (n - 1.0), 0.0))
         ELSE 0.0 END AS stddev
  FROM per
),
tot AS (SELECT sum(n * stddev) AS ns, sum(n) AS nn FROM std)
SELECT stratum, CAST(n AS BIGINT) AS n_rows, stddev,
  CASE WHEN ns > 0.0 THEN {float(_NEYMAN_N)!r} * (n * stddev) / ns
       ELSE {float(_NEYMAN_N)!r} * n / nn END AS alloc_neyman,
  {float(_NEYMAN_N)!r} * n / nn AS alloc_proportional
FROM std CROSS JOIN tot
"""

QUERIES["neyman_allocation_events"] = neyman_allocation_events
ORACLE_SQL["neyman_allocation_events"] = NEYMAN_SQL
