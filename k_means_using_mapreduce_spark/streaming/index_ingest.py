"""Streaming ANN index ingestion: continuous IVF maintenance.

The streaming twin of ``operators/similarity.build_ivf_index``: new
embeddings arrive on a stream and must become searchable without
rebuilding the index. Each micro-batch is assigned to its coarse
K-Means bucket (the frozen coarse quantizer — retraining centroids is
an offline decision, as in FAISS/Milvus) and appended to the
partitioned corpus; probes see new vectors at the next batch boundary.

Layout: ``{path}/corpus/batch=N/cid=M/*.parquet`` — two-level hive
partitioning. ``cid`` stays a partition column, so a probe's
``cid IN (...)`` predicate still prunes directories (PartitionFilters,
plan-asserted in tests); the extra ``batch`` level makes REPLAY
IDEMPOTENT: a retried micro-batch overwrites exactly its own
``batch=N`` subtree (a plain append would double-ingest rows written
before a mid-batch crash). A ``_COMMITTED`` high-water marker makes
completed batches skip entirely.

At scale: each batch writes only its own rows, one file per touched
cid; the small-files growth is bounded by compacting old batches
offline (rewrite ``batch<=N`` subtrees with
``sources/sinks.compact_parquet`` semantics) — the standard
LSM-flavored maintenance every streaming index performs.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F


class IvfIngestSink:
    """foreachBatch handler appending assigned vectors to a partitioned
    IVF corpus. Pass the coarse centroids once (K-Means result or
    ``load_ivf_centroids`` of an offline index); they are persisted at
    ``{path}/centroids`` when the sink is constructed (unless a
    committed corpus already exists) so probes and future sessions
    read the same quantizer."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        centroids,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ):
        self.spark = spark
        self.path = path
        self.centroids = sorted(
            ((int(c), [float(v) for v in vec]) for c, vec in centroids)
        )
        self.vec_col = vec_col
        self.id_col = id_col
        # persist the quantizer at CONSTRUCTION, not inside the first
        # micro-batch: ``spark.createDataFrame`` from the foreachBatch
        # callback thread measured ~6.7 s per run (py4j callback-thread
        # round-trips), ~75% of the whole ingest contract's wall clock;
        # on the driver thread the same 4-row write is ~0.2 s. The
        # overwrite is idempotent, so semantics are unchanged.
        if self.committed_batch() is None:
            _k_row_df(spark, 
                self.centroids, "cid int, centroid array<double>"
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(path, "centroids")
            )

    # ---- replay guard ------------------------------------------------
    def _marker(self) -> str:
        return os.path.join(self.path, "_COMMITTED")

    def committed_batch(self) -> int | None:
        if not os.path.exists(self._marker()):
            return None
        with open(self._marker()) as fh:
            return int(fh.read().strip())

    # ---- ingestion ---------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.kmeans import assign

        committed = self.committed_batch()
        if committed is not None and committed >= batch_id:
            return
        feats = batch_df.select(
            F.col(self.id_col).alias(self.id_col),
            F.col(self.vec_col).cast("array<double>").alias("features"),
        )
        bucketed = assign(feats, self.centroids, keep_dist=False)
        out = os.path.join(self.path, "corpus", f"batch={batch_id}")
        # overwrite of THIS batch's subtree only → replay-idempotent
        bucketed.repartition(F.col("cid")).write.mode("overwrite").partitionBy(
            "cid"
        ).parquet(out)
        tmp = self._marker() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, self._marker())

    # ---- query face --------------------------------------------------
    def corpus(self) -> DataFrame | None:
        """All ingested vectors (partition columns ``batch``, ``cid``),
        or None before the first commit."""
        if self.committed_batch() is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, "corpus"))

    def topk(
        self, query: Sequence[float], k: int = 10, *, nprobe: int = 1
    ) -> DataFrame:
        """Partition-pruned cosine top-k over everything ingested so
        far — same plan shape as ``similarity.ivf_topk_pruned``:
        Scan [PartitionFilters: cid IN probes] → score →
        TakeOrderedAndProject."""
        from ..functions.vectors import cosine_similarity_expr
        from ..operators.similarity import _lit_vec, probe_buckets

        corpus = self.corpus()
        if corpus is None:
            raise ValueError("no batches committed yet")
        probes = probe_buckets(self.centroids, query, nprobe)
        score = cosine_similarity_expr(F.col("features"), _lit_vec(query))
        return (
            corpus.where(F.col("cid").isin(probes))
            .select(F.col(self.id_col).alias(self.id_col), score.alias("score"))
            .orderBy(F.col("score").desc(), F.col(self.id_col).asc())
            .limit(k)
        )
