"""Robust-stats + per-group-cap contract queries (operators/robust.py,
operators/sampling.py::cap_per_group)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.robust import (
    MAD_SIGMA,
    mad_outlier_stats,
    percentile_rank_filter,
    winsorized_mean,
)
from ..operators.sampling import cap_per_group
from ..sources.loaders import load_table, ns_to_us

_CAP = 10
_K = 3.0


def source_cap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return cap_per_group(docs, "source", "doc_id", n=_CAP).select(
        "doc_id", "source"
    )


SOURCE_CAP_SQL = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= {_CAP}
"""


def price_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return mad_outlier_stats(li, "l_extendedprice", ["l_returnflag"], k=_K)


PRICE_MAD_SQL = f"""
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS median
  FROM lineitem GROUP BY 1
), mad AS (
  SELECT l.l_returnflag,
         quantile_cont(abs(l.l_extendedprice - m.median), 0.5) AS mad
  FROM lineitem l JOIN med m USING (l_returnflag) GROUP BY 1
)
SELECT l.l_returnflag,
  CAST(count(*) AS BIGINT) AS n,
  any_value(m.median) AS median,
  any_value(d.mad) AS mad,
  CAST(sum(CASE WHEN abs(l.l_extendedprice - m.median)
                     > {_K * MAD_SIGMA} * d.mad
            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  CAST(sum(CASE WHEN abs(l.l_extendedprice - m.median)
                     > {_K * MAD_SIGMA} * d.mad
            THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS outlier_frac
FROM lineitem l JOIN med m USING (l_returnflag) JOIN mad d USING (l_returnflag)
GROUP BY l.l_returnflag
"""


def winsorized_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per return flag. The operator is 3 passes by
    construction (bracket sketch, in-bracket refine, clamp+mean), so
    the projected 2-column input is materialized ONCE instead of
    re-reading + re-filtering the parquet per pass (round-7 multi-pass
    sweep; 2.15 s -> ~1.2 s at sf0.1)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .localCheckpoint(eager=True)
    )
    return winsorized_mean(li, "l_extendedprice", ["l_returnflag"])


WINSORIZED_SQL = """
WITH bounds AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
  CAST(count(*) AS BIGINT) AS n,
  any_value(b.lo) AS lo,
  any_value(b.hi) AS hi,
  avg(greatest(least(l.l_extendedprice, b.hi), b.lo)) AS wmean
FROM lineitem l JOIN bounds b USING (l_returnflag)
GROUP BY l.l_returnflag
"""


def quality_percentile_filter_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents at or above the within-language quality-score
    quartile — per-group relative filtering, no absolute threshold."""
    from ..functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "q", quality_score("text")
    )
    return percentile_rank_filter(docs, "q", ["lang"], min_pct=0.25).select(
        "doc_id", "lang"
    )


QUALITY_PCT_SQL: str  # assigned below to keep the f-string near its use


def _quality_pct_sql() -> str:
    from ._sql_text import sql_quality_score

    return f"""
WITH scored AS (
  SELECT doc_id, lang, {sql_quality_score('text')} AS q FROM documents
), ranked AS (
  SELECT doc_id, lang,
         percent_rank() OVER (PARTITION BY lang ORDER BY q) AS pct,
         count(*) OVER (PARTITION BY lang) AS gn
  FROM scored
)
SELECT doc_id, lang FROM ranked WHERE pct >= 0.25 OR gn = 1
"""


QUALITY_PCT_SQL = _quality_pct_sql()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "quality_percentile_filter_documents": quality_percentile_filter_documents,
    "source_cap_documents": source_cap_documents,
    "price_outliers_mad": price_outliers_mad,
    "winsorized_price_by_flag": winsorized_price_by_flag,
}

ORACLE_SQL: dict[str, str] = {
    "quality_percentile_filter_documents": QUALITY_PCT_SQL,
    "source_cap_documents": SOURCE_CAP_SQL,
    "price_outliers_mad": PRICE_MAD_SQL,
    "winsorized_price_by_flag": WINSORIZED_SQL,
}


# x is DAYS since 2024-01-01: raw epoch seconds (~1.7e9) would make
# n*sxx - sx^2 a catastrophic-cancellation difference of ~1e25 terms,
# and the engines' different summation orders would then disagree past
# the driver's 1e-6 rounding. Days-since-anchor keeps x in [0, ~31].
_ANCHOR_NS = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z
_DAY_NS = 86_400_000_000_000


def value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robust import group_linear_fit

    ev = load_table(spark, sf_dir, "events").withColumn(
        "t_day",
        ((F.col("ts") - F.lit(_ANCHOR_NS)) / F.lit(_DAY_NS)).cast("double"),
    )
    return group_linear_fit(ev, "t_day", "value", ["event_type"])


TREND_SQL = """
WITH base AS (
  SELECT event_type,
         CAST((epoch_ns(ts) - 1704067200000000000) / 86400000000000 AS DOUBLE) AS x,
         CAST(value AS DOUBLE) AS y
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), agg AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM base GROUP BY event_type
)
SELECT event_type,
  CAST(n AS BIGINT) AS n,
  CASE WHEN n * sxx - sx * sx <> 0.0
       THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
  CASE WHEN n * sxx - sx * sx <> 0.0
       THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
       END AS intercept,
  CASE WHEN n * sxx - sx * sx <> 0.0 AND n * syy - sy * sy <> 0.0
       THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS r2
FROM agg
"""

QUERIES["value_trend_by_type"] = value_trend_by_type
ORACLE_SQL["value_trend_by_type"] = TREND_SQL


def benford_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit Benford audit of order totals (operators/robust.py::
    benford_digit_distribution) — an audit REPORT: synthetic uniform
    money fails Benford, and the per-digit χ² terms show exactly how."""
    from ..operators.robust import benford_digit_distribution

    return benford_digit_distribution(
        load_table(spark, sf_dir, "orders"), "o_totalprice", scale=100
    )


BENFORD_SQL = """
WITH vals AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
  WHERE o_totalprice IS NOT NULL
    AND CAST(round(o_totalprice * 100) AS BIGINT) > 0
),
counts AS (SELECT digit, count(*) AS n FROM vals GROUP BY 1),
digits AS (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS digit),
filled AS (
  SELECT d.digit, CAST(coalesce(n, 0) AS BIGINT) AS n
  FROM digits d LEFT JOIN counts USING (digit)
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM filled)
SELECT digit, n,
  CAST(n AS DOUBLE) / t AS observed_p,
  log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS expected_p,
  t * (CAST(n AS DOUBLE) / t - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
    * (CAST(n AS DOUBLE) / t - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
    / log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS chi2_term
FROM filled, tot
"""

QUERIES["benford_order_totals"] = benford_order_totals
ORACLE_SQL["benford_order_totals"] = BENFORD_SQL


def revenue_concentration_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customer revenue concentration: Gini, HHI, top-1/top-10 shares
    of per-customer order totals — the "how skewed is this corpus"
    diagnostic (operators/robust.py::concentration_stats)."""
    from ..operators.robust import concentration_stats

    return concentration_stats(
        load_table(spark, sf_dir, "orders"), "o_custkey", "o_totalprice"
    )


CONCENTRATION_SQL = """
WITH ent AS (
  -- decimal-exact per-customer totals, then double for ratio math
  SELECT o_custkey AS k, CAST(sum(o_totalprice) AS DOUBLE) AS v
  FROM orders
  WHERE o_totalprice IS NOT NULL
  GROUP BY 1
  HAVING CAST(sum(o_totalprice) AS DOUBLE) >= 0
),
ranked AS (
  SELECT v,
         CAST(row_number() OVER (ORDER BY v ASC, k) AS DOUBLE) AS r,
         row_number() OVER (ORDER BY v DESC, k) AS rd
  FROM ent
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
  sum(v) AS total,
  2.0 * sum(r * v) / (CAST(count(*) AS DOUBLE) * nullif(sum(v), 0.0))
    - (CAST(count(*) AS DOUBLE) + 1.0) / CAST(count(*) AS DOUBLE)
    AS gini,
  sum(v * v) / (nullif(sum(v), 0.0) * nullif(sum(v), 0.0)) AS hhi,
  sum(CASE WHEN rd <= 1 THEN v ELSE 0.0 END) / nullif(sum(v), 0.0)
    AS top1_share,
  sum(CASE WHEN rd <= 10 THEN v ELSE 0.0 END) / nullif(sum(v), 0.0)
    AS top10_share
FROM ranked
"""

QUERIES["revenue_concentration_customer"] = revenue_concentration_customer
ORACLE_SQL["revenue_concentration_customer"] = CONCENTRATION_SQL


def tail_index_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill power-law tail index of order totals above the exact 95th
    percentile (operators/robust.py::tail_index)."""
    from ..operators.robust import tail_index

    return tail_index(load_table(spark, sf_dir, "orders"), "o_totalprice")


TAIL_INDEX_SQL = """
WITH r AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v
  FROM orders WHERE o_totalprice IS NOT NULL
),
cut AS (SELECT quantile_cont(v, 0.95) AS xmin FROM r)
SELECT CAST(count(*) AS BIGINT) AS n_tail,
  any_value(xmin) AS xmin,
  1.0 / nullif(avg(ln(v / xmin)), 0.0) AS alpha
FROM r CROSS JOIN cut
WHERE v > xmin AND xmin > 0
"""

QUERIES["tail_index_order_totals"] = tail_index_order_totals
ORACLE_SQL["tail_index_order_totals"] = TAIL_INDEX_SQL


def mahalanobis_price_quantity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Joint (quantity, extendedprice) outlier screen by Mahalanobis
    distance at the chi2_2 99.9% threshold
    (operators/robust.py::mahalanobis_summary)."""
    from ..operators.robust import mahalanobis_summary

    return mahalanobis_summary(
        load_table(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )


MAHALANOBIS_SQL = """
WITH r AS MATERIALIZED (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM r
),
m AS (
  SELECT n, sx / n AS mx, sy / n AS my, sxx, sxy, syy FROM s
),
v AS (
  SELECT n, mx, my,
    (sxx - n * mx * mx) / (n - 1.0) AS vxx,
    (sxy - n * mx * my) / (n - 1.0) AS vxy,
    (syy - n * my * my) / (n - 1.0) AS vyy
  FROM m
),
inv AS (
  SELECT mx, my,
    vyy / (vxx * vyy - vxy * vxy) AS ixx,
    -vxy / (vxx * vyy - vxy * vxy) AS ixy,
    vxx / (vxx * vyy - vxy * vxy) AS iyy
  FROM v
),
d AS (
  SELECT ixx * (x - mx) * (x - mx)
       + 2.0 * ixy * (x - mx) * (y - my)
       + iyy * (y - my) * (y - my) AS d2
  FROM r CROSS JOIN inv
)
SELECT CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN d2 > 13.815510557964274 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_outliers,
  sum(CASE WHEN d2 > 13.815510557964274 THEN 1.0 ELSE 0.0 END)
    / CAST(count(*) AS DOUBLE) AS outlier_rate,
  max(d2) AS max_d2,
  avg(d2) AS avg_d2
FROM d
"""

QUERIES["mahalanobis_price_quantity"] = mahalanobis_price_quantity
ORACLE_SQL["mahalanobis_price_quantity"] = MAHALANOBIS_SQL


def weighted_price_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantity-weighted price quartiles per return flag — "the median
    dollar-of-demand price", not the median row
    (operators/robust.py::weighted_percentile)."""
    from ..operators.robust import weighted_percentile

    return weighted_percentile(
        load_table(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        [0.25, 0.5, 0.75],
        by=["l_returnflag"],
    )


WEIGHTED_PCT_SQL = """
WITH blocks AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
         sum(CAST(l_quantity AS DOUBLE)) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    AND CAST(l_quantity AS DOUBLE) > 0
  GROUP BY 1, 2
),
stepped AS (
  SELECT l_returnflag, v,
    sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cw,
    sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM blocks
)
SELECT l_returnflag, any_value(tw) AS total_weight,
  min(CASE WHEN cw >= 0.25 * tw THEN v END) AS p_0_25,
  min(CASE WHEN cw >= 0.5 * tw THEN v END) AS p_0_5,
  min(CASE WHEN cw >= 0.75 * tw THEN v END) AS p_0_75
FROM stepped GROUP BY 1
"""

QUERIES["weighted_price_percentiles"] = weighted_price_percentiles
ORACLE_SQL["weighted_price_percentiles"] = WEIGHTED_PCT_SQL


def daily_value_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel fit on daily maxima of event value with the 365-day
    return level (operators/robust.py::gumbel_block_maxima)."""
    from ..operators.robust import gumbel_block_maxima

    ev = load_table(spark, sf_dir, "events")
    us = ns_to_us(F.col("ts").cast("long"))
    day = 86_400_000_000
    ev = ev.withColumn("day_us", us - us % F.lit(day))
    return gumbel_block_maxima(
        ev, "value", "day_us", return_period=365.0
    )


GUMBEL_SQL = """
WITH blocks AS (
  SELECT epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us,
         max(CAST(value AS DOUBLE)) AS m
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(m) AS sm,
         sum(m * m) AS smm
  FROM blocks
),
f AS (
  SELECT n, sm / n AS mean,
    sqrt(nullif((smm - sm * sm / n) / nullif(n - 1.0, 0.0), 0.0) + 0.0)
      AS sd
  FROM s
),
g AS (
  SELECT n, mean, sd,
    sd * 0.779696801233676 AS beta
  FROM f
),
h AS (
  SELECT n, mean, sd, beta,
    mean - 0.5772156649015329 * beta AS mu
  FROM g
)
SELECT CAST(n AS BIGINT) AS n_blocks, mean AS mean_max, sd AS sd_max,
  mu, beta,
  mu - beta * -5.8985259242227315 AS return_level
FROM h
"""

QUERIES["daily_value_gumbel"] = daily_value_gumbel
ORACLE_SQL["daily_value_gumbel"] = GUMBEL_SQL


def monthly_concentration_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Is customer revenue concentration rising month over month?
    concentration_stats grouped by order month — the trend view of
    revenue_concentration_customer."""
    from ..operators.robust import concentration_stats

    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format(F.col("o_orderdate"), "yyyy-MM")
    )
    return concentration_stats(
        o, "o_custkey", "o_totalprice", by=["o_month"], top_k=10
    )


MONTHLY_CONC_SQL = """
WITH ent AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
         o_custkey AS k, CAST(sum(o_totalprice) AS DOUBLE) AS v
  FROM orders
  WHERE o_totalprice IS NOT NULL
  GROUP BY 1, 2
  HAVING CAST(sum(o_totalprice) AS DOUBLE) >= 0
),
ranked AS (
  SELECT o_month, v,
         CAST(row_number() OVER (PARTITION BY o_month
                                 ORDER BY v ASC, k) AS DOUBLE) AS r,
         row_number() OVER (PARTITION BY o_month ORDER BY v DESC, k)
           AS rd
  FROM ent
)
SELECT o_month, CAST(count(*) AS BIGINT) AS n_keys,
  sum(v) AS total,
  2.0 * sum(r * v) / (CAST(count(*) AS DOUBLE) * nullif(sum(v), 0.0))
    - (CAST(count(*) AS DOUBLE) + 1.0) / CAST(count(*) AS DOUBLE)
    AS gini,
  sum(v * v) / (nullif(sum(v), 0.0) * nullif(sum(v), 0.0)) AS hhi,
  sum(CASE WHEN rd <= 1 THEN v ELSE 0.0 END) / nullif(sum(v), 0.0)
    AS top1_share,
  sum(CASE WHEN rd <= 10 THEN v ELSE 0.0 END) / nullif(sum(v), 0.0)
    AS top10_share
FROM ranked GROUP BY 1
"""

QUERIES["monthly_concentration_trend"] = monthly_concentration_trend
ORACLE_SQL["monthly_concentration_trend"] = MONTHLY_CONC_SQL


def theil_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T of customer revenue — the decomposable inequality twin
    of revenue_concentration_customer
    (operators/robust.py::theil_index)."""
    from ..operators.robust import theil_index

    return theil_index(
        load_table(spark, sf_dir, "orders"), "o_custkey", "o_totalprice"
    )


THEIL_SQL = """
WITH ent AS (
  SELECT o_custkey AS k, CAST(sum(o_totalprice) AS DOUBLE) AS v
  FROM orders WHERE o_totalprice IS NOT NULL
  GROUP BY 1
  HAVING CAST(sum(o_totalprice) AS DOUBLE) >= 0
),
tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(v) AS t FROM ent
)
SELECT CAST(any_value(n) AS BIGINT) AS n_keys,
  any_value(t) AS total,
  sum(CASE WHEN v > 0
       THEN (v / nullif(t, 0.0)) * ln(n * (v / nullif(t, 0.0)))
       ELSE 0.0 END) AS theil,
  ln(any_value(n)) AS theil_max
FROM ent CROSS JOIN tot
"""

QUERIES["theil_customer_revenue"] = theil_customer_revenue
ORACLE_SQL["theil_customer_revenue"] = THEIL_SQL


_HBOS_BINS = 16
_HBOS_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def hbos_top_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBOS anomaly screen over lineitem's numeric profile
    (operators/robust.py::hbos_scores): equal-width 16-bin histograms
    per column, score = sum of log(modal count / own-bin count); the
    20 most anomalous line items.

    Rank key is the score ROUNDED to 6 decimals with id as the
    tiebreak (ADVICE r5): the raw score is a 3-term log sum whose
    addition order differs between Spark partitionings and DuckDB, so
    rows sharing all three bins (identical true score — common) could
    flip across the top-20 cut by ulps. Rounding collapses ulp-level
    drift into exact ties that the id breaks identically in both
    engines; the emitted ``hbos`` value stays raw (the 6-sig-fig
    value canon absorbs it)."""
    from ..operators.robust import hbos_scores

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "li_id", F.col("l_orderkey") * 8 + F.col("l_linenumber")
    )
    return (
        hbos_scores(li, _HBOS_COLS, "li_id", bins=_HBOS_BINS)
        .orderBy(F.desc(F.round(F.col("hbos"), 6)), "li_id")
        .limit(20)
    )


def _hbos_sql() -> str:
    b = _HBOS_BINS
    sel = ", ".join(
        f"CAST({c} AS DOUBLE) AS v{i}" for i, c in enumerate(_HBOS_COLS)
    )
    mm = ", ".join(
        f"min(v{i}) AS mn{i}, max(v{i}) AS mx{i}"
        for i in range(len(_HBOS_COLS))
    )
    stacked = "\nUNION ALL\n".join(
        f"""SELECT id, '{c}' AS col,
  CASE WHEN v{i} IS NULL THEN NULL
       ELSE CAST(coalesce(least(floor((v{i} - mn{i})
              / nullif(mx{i} - mn{i}, 0.0) * {b}), {b - 1}), 0) AS INTEGER)
  END AS bin
FROM base CROSS JOIN mm"""
        for i, c in enumerate(_HBOS_COLS)
    )
    return f"""
WITH base AS (
  SELECT l_orderkey * 8 + l_linenumber AS id, {sel} FROM lineitem
), mm AS (SELECT {mm} FROM base),
binned AS (
{stacked}
), counts AS (
  SELECT col, bin, CAST(count(*) AS DOUBLE) AS cnt
  FROM binned WHERE bin IS NOT NULL GROUP BY 1, 2
), cmax AS (
  SELECT col, bin, cnt, max(cnt) OVER (PARTITION BY col) AS mx FROM counts
), scored AS (
  SELECT b.id, sum(coalesce(ln(c.mx / c.cnt), 0.0)) AS hbos
  FROM binned b LEFT JOIN cmax c USING (col, bin)
  GROUP BY 1
)
SELECT id AS li_id, hbos FROM scored
ORDER BY round(hbos, 6) DESC, li_id LIMIT 20
"""


QUERIES["hbos_top_lineitem"] = hbos_top_lineitem
ORACLE_SQL["hbos_top_lineitem"] = _hbos_sql()


def shrunk_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrunk per-source mean quality
    (operators/robust.py::eb_shrunk_means) — the small-source-safe
    ranking signal."""
    from ..functions.text import quality_score
    from ..operators.robust import eb_shrunk_means

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "q", quality_score("text")
    )
    return eb_shrunk_means(docs, "q", ["source"])


def _eb_sql() -> str:
    from ._sql_text import sql_quality_score

    q = sql_quality_score("text")
    return f"""
WITH per AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS n,
         sum({q}) AS s, sum(({q}) * ({q})) AS qq
  FROM documents WHERE ({q}) IS NOT NULL
  GROUP BY 1
), per2 AS (
  SELECT source, n, s, s / n AS m, qq - s * s / n AS wss FROM per
), tot AS (
  SELECT sum(n) AS tn, sum(s) AS ts, sum(wss) AS twss,
         CAST(count(*) AS DOUBLE) AS k
  FROM per2
), btw AS (
  SELECT sum(n * (m - ts / tn) * (m - ts / tn)) AS bss,
         sum(n * n) AS sn2
  FROM per2 CROSS JOIN tot
)
SELECT source, CAST(n AS BIGINT) AS n, m AS mean_raw,
  greatest((bss - (k - 1.0) * (twss / nullif(tn - k, 0.0)))
           / nullif(tn - sn2 / tn, 0.0), 0.0)
  / nullif(greatest((bss - (k - 1.0) * (twss / nullif(tn - k, 0.0)))
                    / nullif(tn - sn2 / tn, 0.0), 0.0)
           + (twss / nullif(tn - k, 0.0)) / n, 0.0) AS shrink_b,
  greatest((bss - (k - 1.0) * (twss / nullif(tn - k, 0.0)))
           / nullif(tn - sn2 / tn, 0.0), 0.0)
  / nullif(greatest((bss - (k - 1.0) * (twss / nullif(tn - k, 0.0)))
                    / nullif(tn - sn2 / tn, 0.0), 0.0)
           + (twss / nullif(tn - k, 0.0)) / n, 0.0) * m
  + (1.0 - greatest((bss - (k - 1.0) * (twss / nullif(tn - k, 0.0)))
                    / nullif(tn - sn2 / tn, 0.0), 0.0)
     / nullif(greatest((bss - (k - 1.0) * (twss / nullif(tn - k, 0.0)))
                       / nullif(tn - sn2 / tn, 0.0), 0.0)
              + (twss / nullif(tn - k, 0.0)) / n, 0.0)) * (ts / tn)
    AS mean_shrunk
FROM per2 CROSS JOIN tot CROSS JOIN btw
"""


QUERIES["shrunk_source_quality"] = shrunk_source_quality
ORACLE_SQL["shrunk_source_quality"] = _eb_sql()


_RANSAC_SEEDS, _RANSAC_EPS = 8, 10000.0


def ransac_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RANSAC line fit of extended price on quantity
    (operators/robust.py::ransac_line, 8 md5-seeded 2-point draws,
    eps = 10000): winning candidate by integer inlier votes, then an
    OLS refit on the winner's inliers. On this synthetic corpus the
    two columns are independent, so the contract gates the sampling /
    voting / refit machinery; the unit tests carry the
    planted-outlier recovery checks."""
    from ..operators.robust import ransac_line

    li = load_table(spark, sf_dir, "lineitem")
    return ransac_line(
        li,
        "l_quantity",
        "l_extendedprice",
        F.concat_ws("-", "l_orderkey", "l_linenumber"),
        seeds=_RANSAC_SEEDS,
        eps=_RANSAC_EPS,
    )


def _ransac_sql() -> str:
    seeds, eps = _RANSAC_SEEDS, _RANSAC_EPS
    return f"""
WITH rb AS MATERIALIZED (
  SELECT CAST(l_orderkey AS VARCHAR) || '-'
           || CAST(l_linenumber AS VARCHAR) AS id,
         CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
cand AS (
  SELECT s, x, y,
         row_number() OVER (PARTITION BY s ORDER BY h, x, y) AS rn
  FROM (
    -- DISTINCT: an exact-duplicate row must not pair a point with
    -- itself at rn=2 (the Spark side's strictly-greater struct min
    -- skips equal (h,x,y) structs)
    SELECT DISTINCT seeds.s, rb.x, rb.y,
           ('0x' || substr(md5(rb.id), 1, 15))::BIGINT
             + seeds.s * ('0x' || substr(md5(rb.id), 16, 14))::BIGINT
             AS h
    FROM rb CROSS JOIN
         (SELECT unnest(range(0, {seeds})) AS s) seeds
  )
  QUALIFY rn <= 2
),
pts AS (
  SELECT s,
    min(CASE WHEN rn = 1 THEN x END) AS x1,
    min(CASE WHEN rn = 1 THEN y END) AS y1,
    min(CASE WHEN rn = 2 THEN x END) AS x2,
    min(CASE WHEN rn = 2 THEN y END) AS y2
  FROM cand GROUP BY s
),
params AS MATERIALIZED (
  SELECT s,
    y1 - ((y2 - y1) / (x2 - x1)) * x1 AS a0,
    (y2 - y1) / (x2 - x1) AS b0
  FROM pts WHERE x2 <> x1 AND x1 IS NOT NULL AND x2 IS NOT NULL
),
votes AS (
  SELECT p.s, p.a0, p.b0,
    sum(CASE WHEN abs(rb.y - (p.a0 + p.b0 * rb.x)) <= {eps!r}
             THEN 1 ELSE 0 END) AS k
  FROM rb CROSS JOIN params p
  GROUP BY 1, 2, 3
),
best AS MATERIALIZED (
  SELECT * FROM votes ORDER BY k DESC, s ASC LIMIT 1
),
sums AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS n, b.s AS best_seed,
    b.a0, b.b0,
    sum(CASE WHEN abs(rb.y - (b.a0 + b.b0 * rb.x)) <= {eps!r}
             THEN 1.0 ELSE 0.0 END) AS k,
    sum(CASE WHEN abs(rb.y - (b.a0 + b.b0 * rb.x)) <= {eps!r}
             THEN 1.0 ELSE 0.0 END * rb.x) AS sx,
    sum(CASE WHEN abs(rb.y - (b.a0 + b.b0 * rb.x)) <= {eps!r}
             THEN 1.0 ELSE 0.0 END * rb.y) AS sy,
    sum(CASE WHEN abs(rb.y - (b.a0 + b.b0 * rb.x)) <= {eps!r}
             THEN 1.0 ELSE 0.0 END * rb.x * rb.y) AS sxy,
    sum(CASE WHEN abs(rb.y - (b.a0 + b.b0 * rb.x)) <= {eps!r}
             THEN 1.0 ELSE 0.0 END * rb.x * rb.x) AS sxx,
    sum(CASE WHEN abs(rb.y - (b.a0 + b.b0 * rb.x)) <= {eps!r}
             THEN 1.0 ELSE 0.0 END * rb.y * rb.y) AS syy
  FROM rb CROSS JOIN best b
  GROUP BY b.s, b.a0, b.b0
),
fit AS (
  SELECT n, best_seed, a0, b0, k, sx, sy, sxy, sxx, syy,
    (k * sxy - sx * sy) / nullif(k * sxx - sx * sx, 0.0) AS b
  FROM sums
),
fit2 AS (
  SELECT fit.*, (sy - b * sx) / k AS a FROM fit
)
SELECT n, CAST(best_seed AS INT) AS best_seed,
  CAST(k AS BIGINT) AS n_inliers, a0, b0, a, b,
  sqrt((syy + k * a * a + b * b * sxx + 2.0 * a * b * sx
        - 2.0 * a * sy - 2.0 * b * sxy) / k) AS rmse_inliers
FROM fit2
"""


QUERIES["ransac_price_quantity"] = ransac_price_quantity
ORACLE_SQL["ransac_price_quantity"] = _ransac_sql()


def boxcox_price_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-Cox re-expression ladder for extended price
    (operators/robust.py::boxcox_profile): profile log-likelihood at
    λ ∈ {−1, −½, 0, ½, 1} from one conditional-sum scan; the winner
    (ties to the simpler/smaller λ) flags which transform a modeling
    stage should apply."""
    from ..operators.robust import boxcox_profile

    return boxcox_profile(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice"
    )


def _boxcox_sql() -> str:
    from ..operators.robust import BOXCOX_LAMBDAS

    sums = ["CAST(count(*) AS DOUBLE) AS n", "sum(ln(y)) AS slny"]
    for i, lam in enumerate(BOXCOX_LAMBDAS):
        z = "ln(y)" if lam == 0.0 else f"(pow(y, {lam!r}) - 1.0) / {lam!r}"
        sums.append(f"sum({z}) AS s{i}")
        sums.append(f"sum({z} * {z}) AS q{i}")
    rows = []
    for i, lam in enumerate(BOXCOX_LAMBDAS):
        var = f"((q{i} - s{i} * s{i} / n) / n)"
        ll = f"-(n / 2.0) * ln({var}) + ({lam!r} - 1.0) * slny"
        rows.append(
            f"SELECT {float(lam)!r} AS lam, CAST(n AS BIGINT) AS n, "
            f"{ll} AS loglik FROM bsums"
        )
    union = "\nUNION ALL\n".join(rows)
    sums_block = ",\n    ".join(sums)
    return f"""
WITH bb AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0
),
bsums AS MATERIALIZED (
  SELECT
    {sums_block}
  FROM bb
),
lls AS (
{union}
)
SELECT lam, n, loglik,
  row_number() OVER (ORDER BY loglik DESC, lam ASC) = 1 AS is_best
FROM lls
"""


QUERIES["boxcox_price_lineitem"] = boxcox_price_lineitem
ORACLE_SQL["boxcox_price_lineitem"] = _boxcox_sql()
