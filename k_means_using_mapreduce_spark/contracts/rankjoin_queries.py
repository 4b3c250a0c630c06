"""Top-k ranking similarity-join contract (operators/rankjoin.py).

Per-user top-5 event-type rankings, top-1-blocked candidates, exact
integer Fagin footrule (location k+1), threshold 4, summarized to one
triage row. Everything is integer arithmetic until the final mean, so
both engines hash-match and the threshold cut cannot ulp-flip.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.loaders import load_table

_RK_K, _RK_MAX_FOOTRULE = 5, 4


def user_ranking_similarity_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Behavioral near-duplicate triage: how many user pairs share an
    almost-identical top-5 event-type ranking (footrule ≤ 4 under
    top-1 blocking), how many are exact ranking duplicates, and the
    mean distance among close pairs — the EDBT-2020 rank-join shape
    (PAPERS.md) over the event log."""
    from ..operators.rankjoin import (
        ranking_join_summary,
        ranking_similarity_join,
        top_k_rankings,
    )

    ev = load_table(spark, sf_dir, "events")
    # pinned: consumed three times (both self-join sides + the summary
    # entity count) — each copy otherwise re-runs the count + window +
    # collect over the event log (guide §5); |users| rows only
    ranks = top_k_rankings(ev, k=_RK_K).localCheckpoint(eager=True)
    pairs = ranking_similarity_join(
        ranks, k=_RK_K, max_footrule=_RK_MAX_FOOTRULE, block_prefix=1
    )
    return ranking_join_summary(pairs, ranks)


_RANKJOIN_SQL = f"""
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
),
rk AS (
  SELECT user_id, event_type,
    row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type)
      AS pos
  FROM c
),
rl AS MATERIALIZED (
  SELECT user_id AS entity, list(event_type ORDER BY pos) AS ranking
  FROM rk WHERE pos <= {_RK_K} GROUP BY 1
),
pairs AS (
  SELECT a.entity AS ea, b.entity AS eb, a.ranking AS ra, b.ranking AS rb
  FROM rl a JOIN rl b
    ON a.ranking[1] = b.ranking[1] AND a.entity < b.entity
),
d AS (
  SELECT ea, eb,
    CAST(list_reduce(
      list_transform(
        list_distinct(list_concat(ra, rb)),
        it -> abs(
          (CASE WHEN list_position(ra, it) = 0 THEN {_RK_K + 1}
                ELSE list_position(ra, it) END)
          - (CASE WHEN list_position(rb, it) = 0 THEN {_RK_K + 1}
                  ELSE list_position(rb, it) END))),
      (x, y) -> x + y) AS BIGINT) AS footrule
  FROM pairs
),
close_pairs AS (SELECT * FROM d WHERE footrule <= {_RK_MAX_FOOTRULE})
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM rl) AS n_entities,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(CASE WHEN footrule = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_identical,
  avg(CAST(footrule AS DOUBLE)) AS mean_footrule
FROM close_pairs
"""

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "user_ranking_similarity_events": user_ranking_similarity_events,
}

ORACLE_SQL: dict[str, str] = {
    "user_ranking_similarity_events": _RANKJOIN_SQL,
}
