"""URL canonicalization / URL-level dedup contract queries.

The documents table carries no URL column, so each query derives a
deterministic crawl-style URL from ``(source, doc_id)`` — four mutating
variants (scheme case, ``www.``, default/explicit ports, doubled and
trailing slashes, tracking params, param order, fragments) that all
collapse to ONE canonical form per ``(source-domain, path, id)`` — and
the oracle SQL performs the identical construction, so the driver
checks the full canonicalization pipeline value-for-value.

Spark side: functions/urls.py (pure JVM regexp/array expressions).
Oracle side: the same rules in DuckDB regexp/list functions; DuckDB's
regexp_replace needs the explicit 'g' flag where Spark replaces all
matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import canonical_url, registered_domain, url_host
from ..sources.loaders import load_table


def _with_urls(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic crawl URL per document (4 variants that
    canonicalize identically; co.uk hosts every 5th doc to exercise
    the two-level-suffix rule). The moduli (20-source, 5, 3, 10 -> a
    60-class canonical key) guarantee distinct documents share
    canonical URLs, so dedup has real work at every sf."""
    base = F.concat(
        F.col("source"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(".example.co.uk")).otherwise(
            F.lit(".example.com")
        ),
    )
    seg = (F.col("doc_id") % 3).cast("string")
    idv = (F.col("doc_id") % 10).cast("string")
    variant = F.col("doc_id") % 4
    url = (
        F.when(
            variant == 0,
            F.concat(
                F.lit("HTTP://WWW."), F.upper(base), F.lit(":80/p//"), seg,
                F.lit("/?utm_source=x&id="), idv, F.lit("&b=2#top"),
            ),
        )
        .when(
            variant == 1,
            F.concat(
                F.lit("https://"), base, F.lit("/p/"), seg,
                F.lit("?b=2&id="), idv,
            ),
        )
        .when(
            variant == 2,
            F.concat(
                F.lit("https://www."), base, F.lit("/p/"), seg,
                F.lit("/?id="), idv, F.lit("&b=2&gclid=zz"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://"), base, F.lit(":8080/p/"), seg,
                F.lit("?id="), idv, F.lit("&b=2"),
            )
        )
    )
    return docs.select("doc_id", "source", url.alias("url"))


#: Oracle twin of _with_urls — identical string construction.
_URLS_CTE = """
urls AS (
  SELECT doc_id, source,
    CASE CAST(doc_id % 4 AS INTEGER)
      WHEN 0 THEN 'HTTP://WWW.' || upper(base) || ':80/p//' || seg
                  || '/?utm_source=x&id=' || idv || '&b=2#top'
      WHEN 1 THEN 'https://' || base || '/p/' || seg || '?b=2&id=' || idv
      WHEN 2 THEN 'https://www.' || base || '/p/' || seg || '/?id=' || idv
                  || '&b=2&gclid=zz'
      ELSE 'http://' || base || ':8080/p/' || seg || '?id=' || idv || '&b=2'
    END AS url
  FROM (
    SELECT doc_id, source,
           source || CASE WHEN doc_id % 5 = 0 THEN '.example.co.uk'
                          ELSE '.example.com' END AS base,
           CAST(doc_id % 3 AS VARCHAR) AS seg,
           CAST(doc_id % 10 AS VARCHAR) AS idv
    FROM documents
  )
)
"""

#: Oracle twin of functions/urls.py — host/path/query/canonical/domain.
_CANON_CTE = """
canon AS (
  SELECT doc_id, source, url,
    CASE WHEN host = '' THEN NULL
         WHEN n_labels >= 3 AND last2 IN
              ('co.uk','com.au','co.jp','com.br','co.in')
           THEN labels[-3] || '.' || last2
         WHEN n_labels <= 1 THEN host
         ELSE last2 END AS domain,
    CASE WHEN host = '' THEN NULL
         ELSE 'https://' || host || path
              || CASE WHEN q = '' THEN '' ELSE '?' || q END
    END AS canonical
  FROM (
    SELECT doc_id, source, url, host, path, q,
           string_split(host, '.') AS labels,
           len(string_split(host, '.')) AS n_labels,
           string_split(host, '.')[-2] || '.'
             || string_split(host, '.')[-1] AS last2
    FROM (
      SELECT doc_id, source, url,
        regexp_replace(regexp_replace(
          lower(regexp_extract(url,
                '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
          ':[0-9]+$', ''), '^www\\.', '') AS host,
        CASE WHEN p2 = '' THEN '/' ELSE p2 END AS path,
        array_to_string(list_sort(list_filter(
          string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
          p -> p <> '' AND NOT regexp_matches(p,
               '^(utm_|fbclid=|gclid=|msclkid=|ref=|mc_cid=|mc_eid=)')
        )), '&') AS q
      FROM (
        SELECT doc_id, source, url,
          regexp_replace(regexp_replace(
            regexp_extract(url,
              '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1),
            '//+', '/', 'g'), '/+$', '') AS p2
        FROM urls
      )
    )
  )
)
"""


def url_canonical_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document canonical URL, host-derived registered domain —
    the crawl-artifact collapse every URL-keyed stage builds on."""
    docs = load_table(spark, sf_dir, "documents")
    u = _with_urls(docs)
    return u.select(
        "doc_id",
        "url",
        canonical_url("url").alias("canonical"),
        registered_domain("url").alias("domain"),
    )


URL_CANONICAL_SQL = (
    "WITH " + _URLS_CTE.strip() + ", " + _CANON_CTE.strip()
    + "\nSELECT doc_id, url, canonical, domain FROM canon"
)


def url_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup: one survivor (min doc_id) per canonical
    URL plus the collapsed count — the cheap pre-pass that removes
    crawl-variant duplicates before any content hashing. Shuffles
    only (canonical, doc_id) pairs, never documents."""
    u = _with_urls(load_table(spark, sf_dir, "documents"))
    return (
        u.select(canonical_url("url").alias("canonical"), "doc_id")
        .groupBy("canonical")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_dups"),
        )
    )


URL_DEDUP_SQL = (
    "WITH " + _URLS_CTE.strip() + ", " + _CANON_CTE.strip()
    + """
SELECT canonical, min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM canon GROUP BY canonical"""
)


def domain_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per registered domain: crawl volume vs distinct canonical
    resources — the per-domain cap / crawl-budget planning view."""
    u = _with_urls(load_table(spark, sf_dir, "documents"))
    return (
        u.select(
            registered_domain("url").alias("domain"),
            canonical_url("url").alias("canonical"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("canonical").alias("n_resources"),
        )
    )


DOMAIN_STATS_SQL = (
    "WITH " + _URLS_CTE.strip() + ", " + _CANON_CTE.strip()
    + """
SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT canonical) AS BIGINT) AS n_resources
FROM canon GROUP BY domain"""
)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "url_canonical_documents": url_canonical_documents,
    "url_dedup_documents": url_dedup_documents,
    "domain_stats_documents": domain_stats_documents,
}

ORACLE_SQL: dict[str, str] = {
    "url_canonical_documents": URL_CANONICAL_SQL,
    "url_dedup_documents": URL_DEDUP_SQL,
    "domain_stats_documents": DOMAIN_STATS_SQL,
}
