"""Similarity-search contract queries (embeddings table) with oracles.

The query vector for the single-query top-k forms is a fixed literal
(EMBEDDING_CENTROIDS[0]'s vector) so both engines score against
byte-identical constants. Cosine folds share operation order with the
Spark expressions, so scores hash-match unrounded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..contract_constants import EMBEDDING_CENTROIDS
from ..operators import similarity as S
from ..sources.loaders import load_table

TOPK = 10
KNN_K = 3
KNN_QUERY_IDS = 5  # queries = vec_id < 5
IVF_NPROBE = 2

QUERY_VEC = EMBEDDING_CENTROIDS[0][1]


def _vec_sql(vec) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vec) + "]::DOUBLE[]"


def _cos_sql(col: str, lit: str) -> str:
    dot = f"list_reduce(list_transform(list_zip({col}, {lit}), z -> z[1] * z[2]), (x, y) -> x + y)"
    na = f"sqrt(list_reduce(list_transform({col}, x -> x * x), (p, q) -> p + q))"
    nb = f"sqrt(list_reduce(list_transform({lit}, x -> x * x), (p, q) -> p + q))"
    return f"({dot} / ({na} * {nb}))"


def ann_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.topk_for_query(
        load_table(spark, sf_dir, "embeddings"), QUERY_VEC, k=TOPK, metric="cosine"
    )


ANN_TOPK_SQL = (
    f"SELECT vec_id, {_cos_sql('embedding::DOUBLE[]', _vec_sql(QUERY_VEC))} AS score "
    f"FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT {TOPK}"
)


def knn_join_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id < KNN_QUERY_IDS)
    return S.knn_join(emb, queries, k=KNN_K)


_KNN_COS = _cos_sql("c.embedding::DOUBLE[]", "q.embedding::DOUBLE[]")

KNN_JOIN_SQL = (
    "SELECT query_id, neighbor_id, rank, cosine FROM ("
    "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
    f"{_KNN_COS} AS cosine, "
    f"row_number() OVER (PARTITION BY q.vec_id ORDER BY {_KNN_COS} DESC, c.vec_id ASC) AS rank "
    f"FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {KNN_QUERY_IDS}) q "
    "WHERE c.vec_id <> q.vec_id"
    f") t WHERE rank <= {KNN_K}"
)


def ivf_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.ivf_topk_for_query(
        load_table(spark, sf_dir, "embeddings"),
        EMBEDDING_CENTROIDS,
        QUERY_VEC,
        k=TOPK,
        nprobe=IVF_NPROBE,
    )


def ivf_multiprobe_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF (nprobe doubled): the recall-vs-bytes-read knob —
    at scale each extra probe adds one partition directory to the scan
    (see operators/similarity.py::ivf_topk_pruned)."""
    return S.ivf_topk_for_query(
        load_table(spark, sf_dir, "embeddings"),
        EMBEDDING_CENTROIDS,
        QUERY_VEC,
        k=TOPK,
        nprobe=IVF_NPROBE * 2,
    )


def _ivf_sql(nprobe: int = IVF_NPROBE) -> str:
    # same driver-side probe selection as ivf_topk_for_query
    probe_ids = sorted(
        (
            (cid, sum((a - b) ** 2 for a, b in zip(vec, QUERY_VEC)))
            for cid, vec in EMBEDDING_CENTROIDS
        ),
        key=lambda t: (t[1], t[0]),
    )[:nprobe]
    probes = ", ".join(str(cid) for cid, _ in probe_ids)
    dist_arms = " UNION ALL ".join(
        f"SELECT vec_id, {cid} AS cid, "
        f"list_reduce(list_transform(list_zip(embedding::DOUBLE[], {_vec_sql(vec)}), "
        "z -> (z[1]-z[2])*(z[1]-z[2])), (a, b) -> a + b) AS sq_dist FROM embeddings"
        for cid, vec in EMBEDDING_CENTROIDS
    )
    return (
        "WITH d AS (" + dist_arms + "), "
        "assigned AS (SELECT vec_id, cid FROM ("
        "SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sq_dist, cid) rn FROM d"
        ") WHERE rn = 1) "
        f"SELECT e.vec_id, {_cos_sql('e.embedding::DOUBLE[]', _vec_sql(QUERY_VEC))} AS score "
        "FROM embeddings e JOIN assigned a ON a.vec_id = e.vec_id "
        f"WHERE a.cid IN ({probes}) ORDER BY score DESC, e.vec_id ASC LIMIT {TOPK}"
    )


IVF_TOPK_SQL = _ivf_sql()
IVF_MULTIPROBE_SQL = _ivf_sql(IVF_NPROBE * 2)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ann_topk_embeddings": ann_topk_embeddings,
    "knn_join_embeddings": knn_join_embeddings,
    "ivf_topk_embeddings": ivf_topk_embeddings,
    "ivf_multiprobe_topk_embeddings": ivf_multiprobe_topk_embeddings,
}

ORACLE_SQL: dict[str, str] = {
    "ann_topk_embeddings": ANN_TOPK_SQL,
    "knn_join_embeddings": KNN_JOIN_SQL,
    "ivf_topk_embeddings": IVF_TOPK_SQL,
    "ivf_multiprobe_topk_embeddings": IVF_MULTIPROBE_SQL,
}


_RECALL_MAXQ, _RECALL_K, _RECALL_NPROBES = 20, 10, (1, 2, 4)


def ivf_recall_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of IVF-pruned search vs the exact brute-force top-k
    for the first 20 query vectors, at nprobe ∈ {1, 2, 4}
    (operators/similarity.py::ivf_recall) — the eval behind the
    nprobe knob. nprobe = 4 scans every cell, so its recall row must
    read 1.0; the lower rows price the pruning."""
    return S.ivf_recall(
        load_table(spark, sf_dir, "embeddings"),
        EMBEDDING_CENTROIDS,
        max_query_id=_RECALL_MAXQ,
        k=_RECALL_K,
        nprobes=_RECALL_NPROBES,
    )


def _ivf_recall_sql() -> str:
    maxq, k = _RECALL_MAXQ, _RECALL_K
    nprobes = ", ".join(f"({p})" for p in sorted(set(_RECALL_NPROBES)))
    dist_arms = " UNION ALL ".join(
        f"SELECT vec_id, {cid} AS cid, "
        f"list_reduce(list_transform(list_zip(embedding::DOUBLE[], {_vec_sql(vec)}), "
        "z -> (z[1]-z[2])*(z[1]-z[2])), (a, b) -> a + b) AS sq_dist FROM embeddings"
        for cid, vec in EMBEDDING_CENTROIDS
    )
    cos = _cos_sql("c.embedding::DOUBLE[]", "q.qv")
    return f"""
WITH d AS MATERIALIZED ({dist_arms}),
assigned AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sq_dist, cid) rn
    FROM d
  ) WHERE rn = 1
),
qcent AS (
  SELECT vec_id AS query_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sq_dist, cid) AS probe_rank
  FROM d WHERE vec_id < {maxq}
),
qs AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {maxq}
),
cand AS MATERIALIZED (
  SELECT q.query_id, c.vec_id AS neighbor_id, {cos} AS cosine,
         qc.probe_rank
  FROM embeddings c
  JOIN assigned a ON a.vec_id = c.vec_id
  CROSS JOIN qs q
  JOIN qcent qc ON qc.query_id = q.query_id AND qc.cid = a.cid
  WHERE c.vec_id <> q.query_id
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) rk
    FROM cand
  ) WHERE rk <= {k}
),
np(nprobe) AS (VALUES {nprobes}),
pruned AS (
  SELECT nprobe, query_id, neighbor_id FROM (
    SELECT np.nprobe, t.query_id, t.neighbor_id,
           row_number() OVER (PARTITION BY np.nprobe, t.query_id
                              ORDER BY t.cosine DESC,
                                       t.neighbor_id ASC) rk
    FROM cand t CROSS JOIN np
    WHERE t.probe_rank <= np.nprobe
  ) WHERE rk <= {k}
),
hits AS (
  SELECT p.nprobe, p.query_id, count(*) AS h
  FROM pruned p JOIN exact e USING (query_id, neighbor_id)
  GROUP BY 1, 2
),
per AS (
  SELECT np.nprobe, q.query_id, coalesce(h.h, 0) AS h
  FROM np CROSS JOIN qs q
  LEFT JOIN hits h ON h.nprobe = np.nprobe AND h.query_id = q.query_id
)
SELECT nprobe, CAST(count(*) AS BIGINT) AS n_queries,
       avg(CAST(h AS DOUBLE) / {float(k)!r}) AS mean_recall
FROM per GROUP BY nprobe
"""


QUERIES["ivf_recall_embeddings"] = ivf_recall_embeddings
ORACLE_SQL["ivf_recall_embeddings"] = _ivf_recall_sql()
