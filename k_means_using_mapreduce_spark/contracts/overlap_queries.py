"""Cross-source analysis contracts: pairwise shingle-overlap matrix
(operators/overlap.py) and log-odds signature terms
(operators/contrast.py) over the documents corpus, grouped by
``source``."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.contrast import signature_terms
from ..operators.overlap import overlap_matrix
from ..sources.loaders import load_table
from ._sql_text import sql_shingles, sql_tokens


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise shingle containment / Jaccard between the 20 sources —
    the inter-source contamination matrix."""
    return overlap_matrix(load_table(spark, sf_dir, "documents"), "source")


SOURCE_OVERLAP_SQL = f"""
WITH sets AS (
  SELECT DISTINCT source AS grp,
    ('0x' || substr(md5(sh), 1, 15))::BIGINT AS sh
  FROM (SELECT source, unnest({sql_shingles('text')}) AS sh FROM documents)
), sizes AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS size FROM sets GROUP BY 1
), inter AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b, CAST(count(*) AS BIGINT) AS inter
  FROM sets a JOIN sets b USING (sh)
  WHERE a.grp < b.grp
  GROUP BY 1, 2
)
SELECT grp_a, grp_b, sa.size AS size_a, sb.size AS size_b, inter,
  CAST(inter AS DOUBLE) / (sa.size + sb.size - inter) AS jaccard,
  CAST(inter AS DOUBLE) / sa.size AS containment_a_in_b,
  CAST(inter AS DOUBLE) / sb.size AS containment_b_in_a
FROM inter
JOIN sizes sa ON inter.grp_a = sa.grp
JOIN sizes sb ON inter.grp_b = sb.grp
"""

_PRIOR = 100.0
_TOP_K = 5


def source_signature_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 tokens per source by z-scored log-odds vs the rest of the
    corpus (Dirichlet prior a0=100)."""
    return signature_terms(
        load_table(spark, sf_dir, "documents"),
        "source",
        k=_TOP_K,
        prior_strength=_PRIOR,
    )


# lateral column aliases (aw/delta/z reused in the same SELECT) are
# DuckDB-supported; expression shapes mirror operators/contrast.py
# operation-for-operation so the doubles agree bit-for-bit
SOURCE_SIGNATURE_SQL = f"""
WITH toks AS (
  SELECT source AS grp, unnest({sql_tokens('text')}) AS token FROM documents
), counts AS (
  SELECT grp, token, CAST(count(*) AS BIGINT) AS y FROM toks GROUP BY 1, 2
), tok_tot AS (
  SELECT token, CAST(sum(y) AS BIGINT) AS y_tot FROM counts GROUP BY 1
), grp_tot AS (
  SELECT grp, CAST(sum(y) AS BIGINT) AS n_g FROM counts GROUP BY 1
), corpus AS (
  SELECT CAST(sum(y) AS BIGINT) AS n_all FROM counts
), scored AS (
  SELECT c.grp, c.token, c.y,
    t.y_tot - c.y AS y_rest,
    ({_PRIOR!r} * t.y_tot) / n.n_all AS aw,
    ln((c.y + aw) / (g.n_g + {_PRIOR!r} - c.y - aw))
      - ln((t.y_tot - c.y + aw)
           / (n.n_all - g.n_g + {_PRIOR!r} - (t.y_tot - c.y) - aw))
      AS delta,
    delta / sqrt(1.0 / (c.y + aw) + 1.0 / (t.y_tot - c.y + aw)) AS z
  FROM counts c
  JOIN tok_tot t USING (token)
  JOIN grp_tot g USING (grp)
  CROSS JOIN corpus n
), ranked AS (
  SELECT grp, token, y, y_rest, delta, z,
    CAST(row_number() OVER (PARTITION BY grp ORDER BY z DESC, token)
         AS INTEGER) AS rank
  FROM scored
)
SELECT grp, token, y, y_rest, delta, z, rank
FROM ranked WHERE rank <= {_TOP_K}
"""

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "source_overlap_matrix": source_overlap_matrix,
    "source_signature_terms": source_signature_terms,
}

ORACLE_SQL: dict[str, str] = {
    "source_overlap_matrix": SOURCE_OVERLAP_SQL,
    "source_signature_terms": SOURCE_SIGNATURE_SQL,
}
