"""Driver-contract query registry.

Every operator the engine claims (SURVEY.md §2) is declared here twice:
as a PySpark DataFrame builder (``QUERIES``) and as the equivalent ANSI
SQL the DuckDB oracle runs on the same parquet tables (``ORACLE_SQL``).
``__spark_entry__.py`` re-exports these to the grading driver.

Fixed-centroid pattern (FIXTURES.md §C): K-Means as a whole is
iterative/seeded and not SQL-expressible, but each stage with *frozen*
centroid literals is a deterministic relational query — those are the
correctness anchors for O7-O9/O13-O15. The full iterative fit (O4,
O17-O19) is exercised by ``entry()`` and the test suite instead.

Float-determinism notes:
- Distance folds are written so Spark and DuckDB do bit-identical
  arithmetic (same left-to-right fold over dimensions, doubles
  end-to-end), so unrounded ``sq_dist`` values hash-match.
- Group means (``avg``) differ only by summation order (~1e-15 rel),
  absorbed by the driver's ~1e-6 rounding before hashing.
- Whole-table SUMs are avoided in favor of AVG-style outputs (a global
  SSE of ~1e8 carries ~1e-5 reduce-order noise — larger than the
  rounding grid; a mean does not).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F

from ..contract_constants import EMBEDDING_CENTROIDS
from ..operators.kmeans import assign, update
from ..sources.loaders import load_table

# --------------------------------------------------------------------------
# Fixed centroid literals (shared by Spark queries and oracle SQL)
# --------------------------------------------------------------------------

# events: value in [0, 490], user_id in [0, 149]
EVENT_CENTROIDS: list[tuple[int, list[float]]] = [
    (1, [100.0, 30.0]),
    (2, [250.0, 75.0]),
    (3, [400.0, 120.0]),
]

# customer: c_acctbal in [-995, 9998] — 1-D clustering
CUSTOMER_CENTROIDS: list[tuple[int, list[float]]] = [
    (1, [-500.0]),
    (2, [2000.0]),
    (3, [5000.0]),
    (4, [8500.0]),
]


def _vec_sql(vec: Sequence[float]) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vec) + "]::DOUBLE[]"


def _sq_dist_sql_2d(xcol: str, ycol: str, cx: float, cy: float) -> str:
    # (0 + dx^2) + dy^2 — identical fold order to the Spark `aggregate`
    # expression, so results are bit-identical.
    return f"(({xcol} - {cx!r})*({xcol} - {cx!r}) + ({ycol} - {cy!r})*({ycol} - {cy!r}))"


def _sq_dist_sql_1d(xcol: str, cx: float) -> str:
    return f"(({xcol} - {cx!r})*({xcol} - {cx!r}))"


def _sq_dist_sql_vec(col: str, vec: Sequence[float]) -> str:
    return (
        f"list_reduce(list_transform(list_zip({col}, {_vec_sql(vec)}), "
        f"z -> (z[1]-z[2])*(z[1]-z[2])), (a, b) -> a + b)"
    )


def _centroid_values_sql(
    centroids: Sequence[tuple[int, Sequence[float]]], cols: Sequence[str]
) -> str:
    rows = ", ".join(
        "(" + ", ".join([str(cid)] + [repr(float(v)) for v in vec]) + ")"
        for cid, vec in centroids
    )
    return f"(VALUES {rows}) AS c(cid, {', '.join(cols)})"


# --------------------------------------------------------------------------
# events: 2-D fixed-centroid kernels (O7, O8, O9)
# --------------------------------------------------------------------------


def _events_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.array(F.col("value"), F.col("user_id").cast("double")).alias("features"),
    )


def kmeans_assign_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign(_events_features(spark, sf_dir), EVENT_CENTROIDS).select(
        "event_id", "cid", "sq_dist"
    )


_ASSIGN_EVENTS_INNER = (
    "SELECT e.event_id, c.cid, "
    + "((0.0 + (e.value - c.x)*(e.value - c.x)) + "
    + "(CAST(e.user_id AS DOUBLE) - c.y)*(CAST(e.user_id AS DOUBLE) - c.y)) AS sq_dist, "
    + "row_number() OVER (PARTITION BY e.event_id ORDER BY "
    + "((0.0 + (e.value - c.x)*(e.value - c.x)) + "
    + "(CAST(e.user_id AS DOUBLE) - c.y)*(CAST(e.user_id AS DOUBLE) - c.y)), c.cid) AS rn "
    + f"FROM events e CROSS JOIN {_centroid_values_sql(EVENT_CENTROIDS, ['x', 'y'])}"
)

ASSIGN_EVENTS_SQL = (
    f"SELECT event_id, cid, sq_dist FROM ({_ASSIGN_EVENTS_INNER}) t WHERE rn = 1"
)


def kmeans_update_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = assign(_events_features(spark, sf_dir), EVENT_CENTROIDS, keep_dist=False)
    return update(assigned).select(
        "cid",
        "n",
        F.col("centroid")[0].alias("mean_x"),
        F.col("centroid")[1].alias("mean_y"),
    )


UPDATE_EVENTS_SQL = (
    "SELECT cid, count(*) AS n, avg(value) AS mean_x, "
    "avg(CAST(user_id AS DOUBLE)) AS mean_y FROM ("
    f"SELECT t.cid, e2.value, e2.user_id FROM ({_ASSIGN_EVENTS_INNER}) t "
    "JOIN events e2 ON e2.event_id = t.event_id WHERE t.rn = 1"
    ") GROUP BY cid"
)


def kmeans_mse_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster mean squared distance — the hash-stable SSE surrogate."""
    assigned = assign(_events_features(spark, sf_dir), EVENT_CENTROIDS)
    return assigned.groupBy("cid").agg(
        F.count("*").alias("n"), F.avg("sq_dist").alias("mse")
    )


MSE_EVENTS_SQL = (
    "SELECT cid, count(*) AS n, avg(sq_dist) AS mse "
    f"FROM ({_ASSIGN_EVENTS_INNER}) t WHERE rn = 1 GROUP BY cid"
)


# --------------------------------------------------------------------------
# customer: 1-D fixed-centroid kernels
# --------------------------------------------------------------------------


def _customer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.array(F.col("c_acctbal")).alias("features")
    )


def kmeans_assign_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign(_customer_features(spark, sf_dir), CUSTOMER_CENTROIDS).select(
        "c_custkey", "cid", "sq_dist"
    )


_ASSIGN_CUSTOMER_INNER = (
    "SELECT cu.c_custkey, c.cid, "
    "(0.0 + (cu.c_acctbal - c.x)*(cu.c_acctbal - c.x)) AS sq_dist, "
    "row_number() OVER (PARTITION BY cu.c_custkey ORDER BY "
    "(0.0 + (cu.c_acctbal - c.x)*(cu.c_acctbal - c.x)), c.cid) AS rn "
    f"FROM customer cu CROSS JOIN {_centroid_values_sql(CUSTOMER_CENTROIDS, ['x'])}"
)

ASSIGN_CUSTOMER_SQL = (
    f"SELECT c_custkey, cid, sq_dist FROM ({_ASSIGN_CUSTOMER_INNER}) t WHERE rn = 1"
)


def kmeans_one_step_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd iteration (assign ∘ update) with frozen init."""
    from ..operators.kmeans import one_step

    stepped = one_step(_customer_features(spark, sf_dir), CUSTOMER_CENTROIDS)
    return stepped.select("cid", "n", F.col("centroid")[0].alias("mean_acctbal"))


ONE_STEP_CUSTOMER_SQL = (
    "SELECT cid, count(*) AS n, avg(c_acctbal) AS mean_acctbal FROM ("
    f"SELECT t.cid, cu2.c_acctbal FROM ({_ASSIGN_CUSTOMER_INNER}) t "
    "JOIN customer cu2 ON cu2.c_custkey = t.c_custkey WHERE t.rn = 1"
    ") GROUP BY cid"
)


# --------------------------------------------------------------------------
# embeddings: 64-D fixed-centroid kernels (the n-D generalization)
# --------------------------------------------------------------------------


def _embeddings_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("features")
    )


def kmeans_assign_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign(_embeddings_features(spark, sf_dir), EMBEDDING_CENTROIDS).select(
        "vec_id", "cid", "sq_dist"
    )


def _assign_embeddings_inner() -> str:
    dist_exprs = {
        cid: _sq_dist_sql_vec("em.embedding::DOUBLE[]", vec)
        for cid, vec in EMBEDDING_CENTROIDS
    }
    arms = " ".join(
        f"SELECT em.vec_id, {cid} AS cid, {expr} AS sq_dist FROM embeddings em UNION ALL"
        for cid, expr in dist_exprs.items()
    ).rsplit(" UNION ALL", 1)[0]
    return (
        "SELECT vec_id, cid, sq_dist, "
        "row_number() OVER (PARTITION BY vec_id ORDER BY sq_dist, cid) AS rn "
        f"FROM ({arms}) d"
    )


ASSIGN_EMBEDDINGS_SQL = (
    f"SELECT vec_id, cid, sq_dist FROM ({_assign_embeddings_inner()}) t WHERE rn = 1"
)


def kmeans_update_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(cluster, dimension) mean — the n-D centroid update exploded to
    scalar rows so the oracle hash compares doubles, not nested arrays."""
    assigned = assign(
        _embeddings_features(spark, sf_dir), EMBEDDING_CENTROIDS, keep_dist=False
    )
    return (
        assigned.select("cid", F.posexplode("features").alias("dim", "v"))
        .groupBy("cid", "dim")
        .agg(F.count("*").alias("n"), F.avg("v").alias("mean_val"))
        .select("cid", F.col("dim").cast("int").alias("dim"), "n", "mean_val")
    )


UPDATE_EMBEDDINGS_SQL = (
    "SELECT cid, CAST(dim - 1 AS INTEGER) AS dim, count(*) AS n, avg(v) AS mean_val "
    "FROM ("
    "SELECT t.cid, generate_subscripts(em2.embedding, 1) AS dim, "
    "unnest(em2.embedding::DOUBLE[]) AS v "
    f"FROM ({_assign_embeddings_inner()}) t "
    "JOIN embeddings em2 ON em2.vec_id = t.vec_id WHERE t.rn = 1"
    ") GROUP BY cid, dim"
)


def kmeans_mse_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = assign(_embeddings_features(spark, sf_dir), EMBEDDING_CENTROIDS)
    return assigned.groupBy("cid").agg(
        F.count("*").alias("n"), F.avg("sq_dist").alias("mse")
    )


MSE_EMBEDDINGS_SQL = (
    "SELECT cid, count(*) AS n, avg(sq_dist) AS mse "
    f"FROM ({_assign_embeddings_inner()}) t WHERE rn = 1 GROUP BY cid"
)


# --------------------------------------------------------------------------
# Full Lloyd loop, hash-gated (O4 literals + O17 + O18 + O19)
# --------------------------------------------------------------------------

#: fixed unroll depth / tolerance for the end-to-end fit contract
FIT_MAX_ITER = 8
FIT_TOL = 1e-4


def kmeans_fit_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENTIRE kmeans_fit driver loop under the hash gate: fixed
    initial centroids (O4 folded as literals), ``max_iter=8``,
    ``tol=1e-4`` by-id convergence (O18), K-row gather (O17), keep-old
    empty-cluster policy (O14) — one row per centroid plus the loop's
    iteration count and convergence verdict. The oracle unrolls the
    same 8 Lloyd iterations as chained MATERIALIZED CTEs over
    distinct-value blocks and applies the same stopping rule
    (reference semantics: master.py:138-150, dump.txt:75-76)."""
    from ..operators.kmeans import kmeans_fit

    cust = load_table(spark, sf_dir, "customer").select(
        F.array(F.col("c_acctbal").cast("double")).alias("features")
    )
    res = kmeans_fit(
        cust,
        len(CUSTOMER_CENTROIDS),
        initial_centroids=CUSTOMER_CENTROIDS,
        max_iter=FIT_MAX_ITER,
        tol=FIT_TOL,
    )
    rows = [
        (
            int(cid),
            float(vec[0]),
            int(res.cluster_sizes.get(cid, 0)),
            int(res.iterations),
            bool(res.converged),
        )
        for cid, vec in res.centroids
    ]
    return _k_row_df(spark, 
        rows, "cid int, x double, n bigint, iterations bigint, converged boolean"
    )


def _kmeans_fit_customer_sql(max_iter: int = FIT_MAX_ITER, tol: float = FIT_TOL) -> str:
    """Chained-CTE unroll of the 1-D Lloyd loop (the house PageRank/
    IRLS/EM trick): it{j} = one assign+update over distinct-value
    blocks, m{j} = max per-coordinate movement, stopping rule = first
    j with m{j} <= tol else max_iter. Weighted block means differ from
    Spark's row means only in summation order (driver-canon noise)."""
    vals = ", ".join(f"({cid}, {vec[0]!r})" for cid, vec in CUSTOMER_CENTROIDS)
    parts = [
        "pts AS MATERIALIZED (SELECT CAST(c_acctbal AS DOUBLE) AS v, "
        "count(*) AS w FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1)",
        f"it0 AS MATERIALIZED (SELECT * FROM (VALUES {vals}) AS t(cid, x))",
    ]
    for j in range(1, max_iter + 1):
        prev = f"it{j-1}"
        parts.append(
            f"""a{j} AS MATERIALIZED (
  SELECT v, w, cid FROM (
    SELECT p.v, p.w, c.cid,
           row_number() OVER (PARTITION BY p.v
                              ORDER BY (p.v - c.x)*(p.v - c.x), c.cid) AS rn
    FROM pts p CROSS JOIN {prev} c) WHERE rn = 1)"""
        )
        parts.append(
            f"""it{j} AS MATERIALIZED (
  SELECT c.cid, coalesce(g.m, c.x) AS x, coalesce(g.n, 0) AS n
  FROM {prev} c LEFT JOIN (
    SELECT cid, sum(v * w) / sum(w) AS m, CAST(sum(w) AS BIGINT) AS n
    FROM a{j} GROUP BY 1) g USING (cid))"""
        )
        parts.append(
            f"m{j} AS MATERIALIZED (SELECT max(abs(u.x - c.x)) AS mv "
            f"FROM it{j} u JOIN {prev} c USING (cid))"
        )
    moves = " UNION ALL ".join(
        f"SELECT {j} AS j, mv FROM m{j}" for j in range(1, max_iter + 1)
    )
    finals = " UNION ALL ".join(
        f"SELECT cid, x, n FROM it{j} WHERE (SELECT j FROM jfin) = {j}"
        for j in range(1, max_iter + 1)
    )
    parts.append(f"moves AS MATERIALIZED ({moves})")
    parts.append(
        f"conv AS MATERIALIZED (SELECT min(j) AS jstar FROM moves WHERE mv <= {tol!r})"
    )
    parts.append(
        f"jfin AS MATERIALIZED (SELECT coalesce(jstar, {max_iter}) AS j, "
        "jstar IS NOT NULL AS converged FROM conv)"
    )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT CAST(f.cid AS INTEGER) AS cid, f.x, CAST(f.n AS BIGINT) AS n,
       CAST((SELECT j FROM jfin) AS BIGINT) AS iterations,
       (SELECT converged FROM jfin) AS converged
FROM ({finals}) f"""
    )


KMEANS_FIT_CUSTOMER_SQL = _kmeans_fit_customer_sql()


def kmeans_fit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D variant of the hash-gated full fit (the reference's own
    shape: 2-D points, master.py:27-34): events (value, user_id),
    K=3, same unroll depth/tolerance."""
    from ..operators.kmeans import kmeans_fit

    res = kmeans_fit(
        _events_features(spark, sf_dir),
        len(EVENT_CENTROIDS),
        initial_centroids=EVENT_CENTROIDS,
        max_iter=FIT_MAX_ITER,
        tol=FIT_TOL,
    )
    rows = [
        (
            int(cid),
            float(vec[0]),
            float(vec[1]),
            int(res.cluster_sizes.get(cid, 0)),
            int(res.iterations),
            bool(res.converged),
        )
        for cid, vec in res.centroids
    ]
    return _k_row_df(spark, 
        rows,
        "cid int, x double, y double, n bigint, iterations bigint, "
        "converged boolean",
    )


def _kmeans_fit_events_sql(max_iter: int = FIT_MAX_ITER, tol: float = FIT_TOL) -> str:
    """2-D chained-CTE Lloyd unroll over (value, user_id) distinct
    blocks; distance fold order (0 + dx²) + dy² matches the Spark
    aggregate expression bit-for-bit."""
    vals = ", ".join(
        f"({cid}, {vec[0]!r}, {vec[1]!r})" for cid, vec in EVENT_CENTROIDS
    )
    d = "((0.0 + (p.vx - c.x)*(p.vx - c.x)) + (p.vy - c.y)*(p.vy - c.y))"
    parts = [
        "pts AS MATERIALIZED (SELECT CAST(value AS DOUBLE) AS vx, "
        "CAST(user_id AS DOUBLE) AS vy, count(*) AS w FROM events "
        "WHERE value IS NOT NULL AND user_id IS NOT NULL GROUP BY 1, 2)",
        f"it0 AS MATERIALIZED (SELECT * FROM (VALUES {vals}) AS t(cid, x, y))",
    ]
    for j in range(1, max_iter + 1):
        prev = f"it{j-1}"
        parts.append(
            f"""a{j} AS MATERIALIZED (
  SELECT vx, vy, w, cid FROM (
    SELECT p.vx, p.vy, p.w, c.cid,
           row_number() OVER (PARTITION BY p.vx, p.vy
                              ORDER BY {d}, c.cid) AS rn
    FROM pts p CROSS JOIN {prev} c) WHERE rn = 1)"""
        )
        parts.append(
            f"""it{j} AS MATERIALIZED (
  SELECT c.cid, coalesce(g.mx, c.x) AS x, coalesce(g.my, c.y) AS y,
         coalesce(g.n, 0) AS n
  FROM {prev} c LEFT JOIN (
    SELECT cid, sum(vx * w) / sum(w) AS mx, sum(vy * w) / sum(w) AS my,
           CAST(sum(w) AS BIGINT) AS n
    FROM a{j} GROUP BY 1) g USING (cid))"""
        )
        parts.append(
            f"m{j} AS MATERIALIZED (SELECT max(greatest(abs(u.x - c.x), "
            f"abs(u.y - c.y))) AS mv FROM it{j} u JOIN {prev} c USING (cid))"
        )
    moves = " UNION ALL ".join(
        f"SELECT {j} AS j, mv FROM m{j}" for j in range(1, max_iter + 1)
    )
    finals = " UNION ALL ".join(
        f"SELECT cid, x, y, n FROM it{j} WHERE (SELECT j FROM jfin) = {j}"
        for j in range(1, max_iter + 1)
    )
    parts.append(f"moves AS MATERIALIZED ({moves})")
    parts.append(
        f"conv AS MATERIALIZED (SELECT min(j) AS jstar FROM moves WHERE mv <= {tol!r})"
    )
    parts.append(
        f"jfin AS MATERIALIZED (SELECT coalesce(jstar, {max_iter}) AS j, "
        "jstar IS NOT NULL AS converged FROM conv)"
    )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT CAST(f.cid AS INTEGER) AS cid, f.x, f.y, CAST(f.n AS BIGINT) AS n,
       CAST((SELECT j FROM jfin) AS BIGINT) AS iterations,
       (SELECT converged FROM jfin) AS converged
FROM ({finals}) f"""
    )


KMEANS_FIT_EVENTS_SQL = _kmeans_fit_events_sql()


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "kmeans_fit_customer": kmeans_fit_customer,
    "kmeans_fit_events": kmeans_fit_events,
    "kmeans_assign_events": kmeans_assign_events,
    "kmeans_update_events": kmeans_update_events,
    "kmeans_mse_events": kmeans_mse_events,
    "kmeans_assign_customer": kmeans_assign_customer,
    "kmeans_one_step_customer": kmeans_one_step_customer,
    "kmeans_assign_embeddings": kmeans_assign_embeddings,
    "kmeans_update_embeddings": kmeans_update_embeddings,
    "kmeans_mse_embeddings": kmeans_mse_embeddings,
}

ORACLE_SQL: dict[str, str] = {
    "kmeans_fit_customer": KMEANS_FIT_CUSTOMER_SQL,
    "kmeans_fit_events": KMEANS_FIT_EVENTS_SQL,
    "kmeans_assign_events": ASSIGN_EVENTS_SQL,
    "kmeans_update_events": UPDATE_EVENTS_SQL,
    "kmeans_mse_events": MSE_EVENTS_SQL,
    "kmeans_assign_customer": ASSIGN_CUSTOMER_SQL,
    "kmeans_one_step_customer": ONE_STEP_CUSTOMER_SQL,
    "kmeans_assign_embeddings": ASSIGN_EMBEDDINGS_SQL,
    "kmeans_update_embeddings": UPDATE_EMBEDDINGS_SQL,
    "kmeans_mse_embeddings": MSE_EMBEDDINGS_SQL,
}


def silhouette_embeddings_by_cluster(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-cluster mean SIMPLIFIED silhouette (Hruschka et al. 2004)
    under the frozen embedding centroids: a = sq-dist to own
    centroid, b = min sq-dist to any other, s = (b - a)/max(a, b)
    (0 when both are 0). NOT the MLlib ClusteringEvaluator formula —
    that one measures mean distance to cluster POINTS (tested
    separately in operators/evaluation.py::silhouette); the
    simplified form is the O(N*K) variant used when K is large.
    Output ``(cid, n, mean_silhouette)`` — bounded rows, no
    whole-table SUM (module determinism note)."""
    from ..functions.vectors import sq_dist_to_literal

    feats = _embeddings_features(spark, sf_dir)
    pairs = F.array(
        *[
            F.struct(
                sq_dist_to_literal(F.col("features"), vec).alias("d"),
                F.lit(cid).alias("cid"),
            )
            for cid, vec in EMBEDDING_CENTROIDS
        ]
    )
    sorted_pairs = F.array_sort(pairs)  # by (d, cid) — assign's tie-break
    a = F.element_at(sorted_pairs, 1)["d"]
    b = F.element_at(sorted_pairs, 2)["d"]
    s = F.when(F.greatest(a, b) == 0, F.lit(0.0)).otherwise(
        (b - a) / F.greatest(a, b)
    )
    return (
        feats.select(
            F.element_at(sorted_pairs, 1)["cid"].alias("cid"), s.alias("s")
        )
        .groupBy("cid")
        .agg(F.count("*").alias("n"), F.avg("s").alias("mean_silhouette"))
    )


def _silhouette_sql() -> str:
    arms = " UNION ALL ".join(
        f"SELECT em.vec_id, {cid} AS cid, "
        f"{_sq_dist_sql_vec('em.embedding::DOUBLE[]', vec)} AS d "
        "FROM embeddings em"
        for cid, vec in EMBEDDING_CENTROIDS
    )
    return f"""
WITH dists AS ({arms}),
ranked AS (
  SELECT vec_id, cid, d,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
  FROM dists
),
ab AS (
  SELECT o.vec_id, o.cid, o.d AS a, s.d AS b
  FROM (SELECT * FROM ranked WHERE rn = 1) o
  JOIN (SELECT * FROM ranked WHERE rn = 2) s USING (vec_id)
)
SELECT cid, CAST(count(*) AS BIGINT) AS n,
       avg(CASE WHEN greatest(a, b) = 0 THEN 0.0
                ELSE (b - a) / greatest(a, b) END) AS mean_silhouette
FROM ab GROUP BY cid
"""


SILHOUETTE_SQL = _silhouette_sql()

QUERIES["silhouette_embeddings_by_cluster"] = silhouette_embeddings_by_cluster
ORACLE_SQL["silhouette_embeddings_by_cluster"] = SILHOUETTE_SQL


def gmm_price_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component 1-D Gaussian mixture of extendedprice by 3 EM
    rounds (operators/kmeans.py::gmm1d_fit) — the soft-assignment
    sibling of the K-Means contracts above."""
    from ..operators.kmeans import gmm1d_fit

    return gmm1d_fit(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice", iters=3
    )


def _gmm_logdens(w: str, m: str, v: str) -> str:
    return (
        f"ln({w}) - 0.5 * ln(2.0 * pi() * {v})"
        f" - (x - {m}) * (x - {m}) / (2.0 * {v})"
    )


def _gmm_sql(iters: int = 3) -> str:
    l1 = _gmm_logdens("w1", "m1", "v1")
    l2 = _gmm_logdens("1.0 - w1", "m2", "v2")
    parts = [
        """vals AS MATERIALIZED (
  SELECT CAST(l_extendedprice AS DOUBLE) AS x
  FROM lineitem WHERE l_extendedprice IS NOT NULL
)""",
        """p0 AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, 0.5 AS w1,
         quantile_cont(x, 0.25) AS m1, var_pop(x) AS v1,
         quantile_cont(x, 0.75) AS m2, var_pop(x) AS v2
  FROM vals
)""",
    ]
    for k in range(1, iters + 1):
        parts.append(f"""s{k} AS MATERIALIZED (
  SELECT any_value(n) AS n,
         sum(r) AS r1, sum(r * x) AS rx1, sum(r * x * x) AS rxx1,
         sum((1.0 - r) * x) AS rx2, sum((1.0 - r) * x * x) AS rxx2
  FROM (
    SELECT p.n, vals.x,
      1.0 / (1.0 + exp(({l2}) - ({l1}))) AS r
    FROM vals CROSS JOIN p{k - 1} p
  ) t
)""")
        parts.append(f"""p{k} AS (
  SELECT n, r1 / n AS w1,
         rx1 / r1 AS m1,
         rxx1 / r1 - (rx1 / r1) * (rx1 / r1) AS v1,
         rx2 / (n - r1) AS m2,
         rxx2 / (n - r1) - (rx2 / (n - r1)) * (rx2 / (n - r1)) AS v2
  FROM s{k}
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(any_value(n) AS BIGINT) AS n,
  any_value(w1) AS w1, any_value(m1) AS m1, any_value(v1) AS v1,
  any_value(m2) AS m2, any_value(v2) AS v2,
  sum(greatest({l1}, {l2})
      + ln(1.0 + exp(least({l1}, {l2}) - greatest({l1}, {l2}))))
    AS log_lik
FROM vals CROSS JOIN p{iters}
"""
    )


QUERIES["gmm_price_components"] = gmm_price_components
ORACLE_SQL["gmm_price_components"] = _gmm_sql(3)
