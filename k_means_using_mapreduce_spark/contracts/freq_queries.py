"""Count-min frequency-sketch contract queries with DuckDB oracles.

Unlike the HLL/KLL/theta families (library binaries, pinned by property
tests), the count-min sketch in operators/freq.py is built from the
engine's md5 affine hash family, so BOTH the sketch table and the
estimates are bit-reproducible in DuckDB — the whole approximate
structure is oracle-checked, not just trusted.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.freq import (
    build_freq_sketch,
    estimate_counts,
    sketch_from_counts,
    value_counts,
)
from ..sources.loaders import load_table
from ._sql_text import sql_tokens

CM_DEPTH = 3
CM_WIDTH = 256

# probe set: frequent synthetic-vocab words plus one absent control
# (its estimate must be 0 unless all CM_DEPTH rows collide)
PROBE_TOKENS = ["spark", "data", "join", "agg", "window", "scan", "zzznever"]


def _token_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.explode(T.tokens("text")).alias("token"))


def token_freq_sketch_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global count-min sketch of document tokens as sparse
    (d, bucket, cnt) rows — the persistable pre-aggregate, bounded at
    depth x width rows no matter the corpus size."""
    return build_freq_sketch(
        _token_rows(spark, sf_dir), [], "token", depth=CM_DEPTH, width=CM_WIDTH
    )


_CM_DEPTH_VALUES = ", ".join(f"({i})" for i in range(CM_DEPTH))

TOKEN_FREQ_SKETCH_SQL = f"""
SELECT d,
       ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || token), 1, 15))::BIGINT
         % {CM_WIDTH} AS bucket,
       count(*) AS cnt
FROM (SELECT unnest({sql_tokens("text")}) AS token FROM documents) toks
CROSS JOIN (VALUES {_CM_DEPTH_VALUES}) AS ds(d)
GROUP BY 1, 2
"""


def token_freq_estimate_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Count-min estimates for a fixed probe set, side-by-side with the
    exact counts: ``est >= exact`` for every probe (the sketch only
    overcounts), and the absent control estimates 0-or-collision."""
    counts = value_counts(_token_rows(spark, sf_dir), [], "token")
    sketch = sketch_from_counts(counts, [], depth=CM_DEPTH, width=CM_WIDTH)
    probes = _k_row_df(spark, 
        [(p,) for p in PROBE_TOKENS], "probe string"
    )
    est = estimate_counts(sketch, probes, "probe", depth=CM_DEPTH, width=CM_WIDTH)
    exact = counts.where(F.col("_v").isin(PROBE_TOKENS)).select(
        F.col("_v").alias("probe"), F.col("cnt").alias("exact")
    )
    return est.join(exact, "probe", "left").select(
        "probe",
        "est",
        F.coalesce(F.col("exact"), F.lit(0)).alias("exact"),
    )


_PROBE_VALUES = ", ".join(f"('{p}')" for p in PROBE_TOKENS)

TOKEN_FREQ_ESTIMATE_SQL = f"""
WITH toks AS (SELECT unnest({sql_tokens("text")}) AS token FROM documents),
sketch AS (
  SELECT d,
         ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || token), 1, 15))::BIGINT
           % {CM_WIDTH} AS bucket,
         count(*) AS cnt
  FROM toks CROSS JOIN (VALUES {_CM_DEPTH_VALUES}) AS ds(d)
  GROUP BY 1, 2
),
probes AS (SELECT * FROM (VALUES {_PROBE_VALUES}) AS p(probe)),
keyed AS (
  SELECT probe, d,
         ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || probe), 1, 15))::BIGINT
           % {CM_WIDTH} AS bucket
  FROM probes CROSS JOIN (VALUES {_CM_DEPTH_VALUES}) AS ds(d)
),
est AS (
  SELECT probe, min(coalesce(cnt, 0)) AS est
  FROM keyed LEFT JOIN sketch USING (d, bucket)
  GROUP BY probe
),
exact AS (
  SELECT token AS probe, count(*) AS exact FROM toks
  WHERE token IN (SELECT probe FROM probes)
  GROUP BY token
)
SELECT probe, est, coalesce(exact, 0) AS exact
FROM est LEFT JOIN exact USING (probe)
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "token_freq_sketch_documents": token_freq_sketch_documents,
    "token_freq_estimate_documents": token_freq_estimate_documents,
}

ORACLE_SQL: dict[str, str] = {
    "token_freq_sketch_documents": TOKEN_FREQ_SKETCH_SQL,
    "token_freq_estimate_documents": TOKEN_FREQ_ESTIMATE_SQL,
}


def join_size_estimate_orders_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Count-min join-cardinality pre-flight: estimate |orders ⋈
    lineitem| on orderkey from two KB-sized sketches, next to the
    true size — est >= exact by the overcount guarantee, visible in
    the row itself (operators/freq.py::estimate_join_size)."""
    from ..operators.freq import build_freq_sketch, estimate_join_size

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sa = build_freq_sketch(orders, [], "o_orderkey", depth=CM_DEPTH, width=JS_WIDTH)
    sb = build_freq_sketch(li, [], "l_orderkey", depth=CM_DEPTH, width=JS_WIDTH)
    est = estimate_join_size(sa, sb)
    exact = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .agg(F.count("*").alias("exact"))
    )
    return est.crossJoin(exact)


JS_WIDTH = 16384  # inner-product error is ADDITIVE ~ Na*Nb/width; size width to the join

JOIN_SIZE_ESTIMATE_SQL = f"""
WITH sa AS (
  SELECT d,
         ('0x' || substr(md5(CAST(d AS VARCHAR) || ':'
            || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
           % {JS_WIDTH} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM orders CROSS JOIN (VALUES {_CM_DEPTH_VALUES}) AS ds(d)
  WHERE o_orderkey IS NOT NULL
  GROUP BY 1, 2
), sb AS (
  SELECT d,
         ('0x' || substr(md5(CAST(d AS VARCHAR) || ':'
            || CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
           % {JS_WIDTH} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem CROSS JOIN (VALUES {_CM_DEPTH_VALUES}) AS ds(d)
  WHERE l_orderkey IS NOT NULL
  GROUP BY 1, 2
), ip AS (
  SELECT sa.d, CAST(sum(sa.cnt * sb.cnt) AS BIGINT) AS ip
  FROM sa JOIN sb ON sa.d = sb.d AND sa.bucket = sb.bucket
  GROUP BY 1
), est AS (
  SELECT min(ip) AS est FROM ip
), ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)
SELECT est, exact FROM est CROSS JOIN ex
"""

QUERIES["join_size_estimate_orders_lineitem"] = join_size_estimate_orders_lineitem
ORACLE_SQL["join_size_estimate_orders_lineitem"] = JOIN_SIZE_ESTIMATE_SQL


def distinct_users_minhash_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distinct-user estimate per event type
    (operators/sketch.py::minhash_distinct_estimate, k=16 min-hashes):
    approximate in value, exact in reproduction — the oracle replays
    the same minima and lands on the identical estimate."""
    from ..operators.sketch import minhash_distinct_estimate

    ev = load_table(spark, sf_dir, "events")
    return minhash_distinct_estimate(
        ev, "user_id", ["event_type"], num_hashes=16
    )


def _minhash_distinct_sql(num_hashes: int = 16) -> str:
    from ..operators.dedup import MINHASH_AFFINE, MINHASH_P

    base = (
        f"(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"
        f" % {MINHASH_P})"
    )
    mins = ", ".join(
        f"min(CAST(({a} * x + {b}) % {MINHASH_P} + 1 AS DOUBLE)"
        f" / {float(MINHASH_P)!r}) AS u{i}"
        for i, (a, b) in enumerate(MINHASH_AFFINE[:num_hashes])
    )
    ssum = " + ".join(f"u{i}" for i in range(num_hashes))
    return f"""
WITH b AS (
  SELECT event_type, {base} AS x FROM events WHERE user_id IS NOT NULL
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows, {mins}
  FROM b GROUP BY 1
)
SELECT event_type, n_rows,
       {float(num_hashes)!r} / ({ssum}) - 1.0 AS distinct_est
FROM g
"""


QUERIES["distinct_users_minhash_events"] = distinct_users_minhash_events
ORACLE_SQL["distinct_users_minhash_events"] = _minhash_distinct_sql()
