"""MLlib-accelerated near-dup & ANN — the library fast paths.

SURVEY.md §2 maps the north-star dedup/similarity operators onto
MLlib's `MinHashLSH` / `BucketedRandomProjectionLSH`; these wrappers
expose them with this engine's column conventions. They complement the
hand-rolled operators in dedup.py/similarity.py:

- dedup.py's md5-based MinHash is *oracle-checkable* (engine-portable
  hashes) — the correctness anchor;
- these MLlib paths use JVM-native hash families and vectorized
  distance kernels — the scale path when exact cross-engine
  reproducibility is not required.

Both are seeded and deterministic within Spark.
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    CountVectorizer,
    HashingTF,
    MinHashLSH,
)
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hash_tables: int = 8,
    jaccard_threshold: float = 0.5,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs via MLlib MinHashLSH.

    shingle set → sparse binary vector (HashingTF) → MinHashLSH
    approxSimilarityJoin at Jaccard distance ≤ 1-threshold. Returns
    (id_a, id_b, jaccard_dist). Rows with zero shingles are dropped
    (LSH requires ≥1 non-zero entry).
    """
    from ..functions.text import shingles_of, tokens

    sh = (
        df.select(F.col(id_col).alias(id_col), tokens(content_col).alias("_toks"))
        .select(id_col, shingles_of(F.col("_toks"), shingle_n).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    tf = HashingTF(
        inputCol="sh", outputCol="vec", numFeatures=num_features, binary=True
    )
    vecs = tf.transform(sh)
    lsh = MinHashLSH(
        inputCol="vec", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(
        vecs, vecs, 1.0 - jaccard_threshold, distCol="jaccard_dist"
    )
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            "jaccard_dist",
        )
    )


def brp_lsh_ann(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate nearest neighbors by euclidean distance via
    BucketedRandomProjectionLSH. Returns (id, dist) ascending."""
    from pyspark.ml.linalg import Vectors

    vecs = df.select(
        F.col(id_col).alias(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("vec"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    out = model.approxNearestNeighbors(vecs, Vectors.dense(query), k, distCol="dist")
    return out.select(id_col, "dist")


def tfidf_vectors(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 4096,
    min_df: float = 1.0,
) -> DataFrame:
    """Tokenize → CountVectorizer → IDF weights, returning
    (id, features: VectorUDT). The text→vector front end of the
    TF-IDF → K-Means pipeline (SURVEY.md §7 phase 5)."""
    from pyspark.ml.feature import IDF

    from ..functions.text import tokens

    toks = df.select(F.col(id_col).alias(id_col), tokens(content_col).alias("toks"))
    cv = CountVectorizer(
        inputCol="toks", outputCol="tf", vocabSize=vocab_size, minDF=min_df
    ).fit(toks)
    tf = cv.transform(toks)
    idf = IDF(inputCol="tf", outputCol="features").fit(tf)
    return idf.transform(tf).select(id_col, "features")


def cluster_documents_tfidf(
    df: DataFrame,
    k: int = 5,
    content_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    max_iter: int = 20,
    vocab_size: int = 4096,
) -> DataFrame:
    """End-to-end text clustering: TF-IDF vectors → MLlib KMeans →
    (id, cluster). The reference's clustering core applied to the
    `documents` table through a text front end."""
    from pyspark.ml.clustering import KMeans

    vecs = tfidf_vectors(df, content_col, id_col, vocab_size)
    model = KMeans(
        k=k, seed=seed, maxIter=max_iter, featuresCol="features"
    ).fit(vecs)
    return model.transform(vecs).select(
        id_col, F.col("prediction").alias("cluster")
    )
