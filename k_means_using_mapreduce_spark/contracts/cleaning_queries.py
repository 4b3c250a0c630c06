"""Corpus-cleaning contract queries: decontamination, PII redaction,
mixture planning/application, table profiling (operators/cleaning.py).

The documents table has no natural PII (synthetic word soup), so the
PII contract derives an adversarial input IN-QUERY: both engines append
the same deterministic doc_id-derived email / IPv4 / phone / ID-number
string to every document, then scan and redact it — the redaction
logic is value-hash-checked end to end instead of trivially counting
zeros. The decontamination eval set is the deterministic doc_id % 97
slice of the corpus itself.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import bpe_ish_token_count
from ..operators.cleaning import (
    PII_RULES,
    apply_mixture,
    decontaminate,
    mixture_plan,
    pii_redact,
    pii_scan,
    profile_table,
)
from ..sources.loaders import load_table
from ._sql_text import sql_bpe_ish_token_count, sql_shingles

# --------------------------------------------------------------------------
# decontamination
# --------------------------------------------------------------------------


def decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    out = decontaminate(train, eval_df, shingle_n=3, threshold=0.1)
    return out.withColumn("is_contaminated", F.col("is_contaminated").cast("int"))


_HIT = "CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END"

DECONTAMINATE_SQL = f"""
WITH train_sh AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, unnest({sql_shingles('text', 3)}) AS sh
        FROM documents WHERE doc_id % 97 <> 0)
), eval_sh AS (
  SELECT DISTINCT ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h
  FROM (SELECT unnest({sql_shingles('text', 3)}) AS sh
        FROM documents WHERE doc_id % 97 = 0)
)
SELECT t.doc_id,
  CAST(count(*) AS INTEGER) AS distinct_shingles,
  CAST(sum({_HIT}) AS INTEGER) AS contaminated_shingles,
  CAST(sum({_HIT}) AS DOUBLE) / count(*) AS contamination_frac,
  CAST(CASE WHEN CAST(sum({_HIT}) AS DOUBLE) / count(*) >= 0.1
       THEN 1 ELSE 0 END AS INTEGER) AS is_contaminated
FROM train_sh t LEFT JOIN eval_sh e ON t.h = e.h
GROUP BY t.doc_id
"""

# --------------------------------------------------------------------------
# PII scan + redact over injected synthetic PII
# --------------------------------------------------------------------------


def _injected_pii(docs: DataFrame) -> DataFrame:
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" tel +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ref "),
        F.lpad(F.col("doc_id").cast("string"), 9, "0"),
    )
    return docs.select("doc_id", pii_text.alias("text"))


def pii_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    injected = _injected_pii(load_table(spark, sf_dir, "documents"))
    scan = pii_scan(injected)
    red = pii_redact(injected).select(
        "doc_id", F.md5("redacted").alias("redacted_md5"), "n_redacted"
    )
    return scan.join(red, "doc_id")


_INJECT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com via 10.'"
    " || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR)"
    " || ' tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ref ' || lpad(CAST(doc_id AS VARCHAR), 9, '0')"
)

_P = {name: pat for name, pat, _ in PII_RULES}
_R = {name: repl for name, _, repl in PII_RULES}

PII_REDACT_SQL = f"""
WITH injected AS (
  SELECT doc_id, {_INJECT_SQL} AS text FROM documents
), s1 AS (
  SELECT doc_id, text,
    len(regexp_extract_all(text, '{_P["email"]}')) AS c1,
    regexp_replace(text, '{_P["email"]}', '{_R["email"]}', 'g') AS t1
  FROM injected
), s2 AS (
  SELECT *, len(regexp_extract_all(t1, '{_P["phone"]}')) AS c2,
    regexp_replace(t1, '{_P["phone"]}', '{_R["phone"]}', 'g') AS t2
  FROM s1
), s3 AS (
  SELECT *, len(regexp_extract_all(t2, '{_P["ipv4"]}')) AS c3,
    regexp_replace(t2, '{_P["ipv4"]}', '{_R["ipv4"]}', 'g') AS t3
  FROM s2
), s4 AS (
  SELECT *, len(regexp_extract_all(t3, '{_P["id_number"]}')) AS c4,
    regexp_replace(t3, '{_P["id_number"]}', '{_R["id_number"]}', 'g') AS t4
  FROM s3
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_P["email"]}')) AS INTEGER) AS n_email,
  CAST(len(regexp_extract_all(text, '{_P["phone"]}')) AS INTEGER) AS n_phone,
  CAST(len(regexp_extract_all(text, '{_P["ipv4"]}')) AS INTEGER) AS n_ipv4,
  CAST(len(regexp_extract_all(text, '{_P["id_number"]}')) AS INTEGER)
    AS n_id_number,
  CAST(len(regexp_extract_all(text, '{_P["email"]}'))
     + len(regexp_extract_all(text, '{_P["phone"]}'))
     + len(regexp_extract_all(text, '{_P["ipv4"]}'))
     + len(regexp_extract_all(text, '{_P["id_number"]}')) AS INTEGER)
    AS pii_total,
  md5(t4) AS redacted_md5,
  CAST(c1 + c2 + c3 + c4 AS INTEGER) AS n_redacted
FROM s4
"""

# --------------------------------------------------------------------------
# mixture planning / application
# --------------------------------------------------------------------------


def mixture_plan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_plan(load_table(spark, sf_dir, "documents"), budget_frac=0.5)


_BPE = sql_bpe_ish_token_count("text")

_PLAN_CTE = f"""
per_source AS (
  SELECT source, CAST(count(*) AS INTEGER) AS n_docs,
    CAST(sum({_BPE}) AS BIGINT) AS source_tokens, 1.0 AS weight
  FROM documents GROUP BY source
), totals AS (
  SELECT CAST(sum(source_tokens) AS DOUBLE) AS tt, sum(weight) AS tw
  FROM per_source
)"""

MIXTURE_PLAN_SQL = f"""
WITH {_PLAN_CTE}
SELECT source, n_docs, source_tokens, weight,
  0.5 * tt * (weight / tw) AS target_tokens,
  least(1.0, (0.5 * tt * (weight / tw)) / source_tokens) AS rate
FROM per_source, totals
"""


def mixture_sample_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    plan = mixture_plan(docs, budget_frac=0.5)
    kept = apply_mixture(docs, plan, key="doc_id")
    return kept.groupBy("source").agg(
        F.count("*").cast("int").alias("kept_docs"),
        F.sum(bpe_ish_token_count("text")).cast("long").alias("kept_tokens"),
    )


MIXTURE_SAMPLE_SQL = f"""
WITH {_PLAN_CTE}, plan AS (
  SELECT source,
    least(1.0, (0.5 * tt * (weight / tw)) / source_tokens) AS rate
  FROM per_source, totals
), kept AS (
  SELECT d.source, {sql_bpe_ish_token_count('d.text')} AS toks
  FROM documents d JOIN plan p ON d.source = p.source
  WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
         % 1000000) < p.rate * 1000000.0
)
SELECT source, CAST(count(*) AS INTEGER) AS kept_docs,
  CAST(sum(toks) AS BIGINT) AS kept_tokens
FROM kept GROUP BY source
"""

# --------------------------------------------------------------------------
# hashing-trick classifier scoring
# --------------------------------------------------------------------------

#: Feature-space size / pseudo-weight modulus for the contract query.
CLASSIFIER_DIM = 1024
CLASSIFIER_SCALE = 1997


def classifier_scores_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import pseudo_weights, score_documents

    docs = load_table(spark, sf_dir, "documents")
    weights = pseudo_weights(spark, dim=CLASSIFIER_DIM, scale=CLASSIFIER_SCALE)
    out = score_documents(docs, weights, dim=CLASSIFIER_DIM, bias=0.0, threshold=0.5)
    return out.withColumn("keep", F.col("keep").cast("int"))


CLASSIFIER_SCORES_SQL = f"""
WITH weights AS (
  SELECT i AS idx,
    CAST((i * 2654435761) % {CLASSIFIER_SCALE} AS DOUBLE)
      / {float(CLASSIFIER_SCALE)} - 0.5 AS w
  FROM range({CLASSIFIER_DIM}) t(i)
), tf AS (
  SELECT doc_id,
    ('0x' || substr(md5(tok), 1, 15))::BIGINT % {CLASSIFIER_DIM} AS idx,
    count(*) AS tf
  FROM (SELECT doc_id, unnest({{tokens}}) AS tok FROM documents)
  GROUP BY doc_id, idx
), scored AS (
  SELECT t.doc_id, 0.0 + sum(t.tf * coalesce(w.w, 0.0)) AS z
  FROM tf t LEFT JOIN weights w ON t.idx = w.idx GROUP BY t.doc_id
  UNION ALL
  SELECT doc_id, 0.0 AS z FROM documents WHERE len({{tokens}}) = 0
)
SELECT doc_id, z, 1.0 / (1.0 + exp(-z)) AS prob,
  CAST(CASE WHEN 1.0 / (1.0 + exp(-z)) >= 0.5 THEN 1 ELSE 0 END AS INTEGER)
    AS keep
FROM scored
"""


def _classifier_sql() -> str:
    from ._sql_text import sql_tokens

    return CLASSIFIER_SCORES_SQL.replace("{tokens}", sql_tokens("text"))


# --------------------------------------------------------------------------
# table profiling
# --------------------------------------------------------------------------

_PROFILE_COLS = [
    "l_orderkey",
    "l_linenumber",
    "l_quantity",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]


def table_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(
        load_table(spark, sf_dir, "lineitem"), _PROFILE_COLS, exact=True
    )


TABLE_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, count(*) AS n_rows, count({c}) AS non_null,
  count(DISTINCT {c}) AS n_distinct, CAST(min({c}) AS VARCHAR) AS min_value,
  CAST(max({c}) AS VARCHAR) AS max_value FROM lineitem"""
    for c in _PROFILE_COLS
)




def temperature_mixture_plan_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled mixture plan (weights = share^alpha) — the
    data-derived twin of mixture_plan_documents."""
    from ..operators.cleaning import temperature_mixture_plan

    return temperature_mixture_plan(
        load_table(spark, sf_dir, "documents"), alpha=0.5, budget_frac=0.5
    )


_TEMP_CTE = f"""
per_source AS (
  SELECT source, CAST(count(*) AS INTEGER) AS n_docs,
    CAST(sum({_BPE}) AS BIGINT) AS source_tokens
  FROM documents GROUP BY source
), tok AS (
  SELECT CAST(sum(source_tokens) AS DOUBLE) AS tt FROM per_source
), w AS (
  SELECT source, n_docs, source_tokens, tt,
    CASE WHEN tt > 0 THEN source_tokens / tt ELSE 0.0 END AS share,
    pow(CASE WHEN tt > 0 THEN source_tokens / tt ELSE 0.0 END, 0.5) AS weight
  FROM per_source, tok
), wt AS (SELECT sum(weight) AS tw FROM w)"""

TEMPERATURE_PLAN_SQL = f"""
WITH {_TEMP_CTE}
SELECT source, n_docs, source_tokens, share, weight,
  CASE WHEN tw > 0 THEN 0.5 * tt * (weight / tw) ELSE 0.0 END AS target_tokens,
  CASE WHEN source_tokens > 0
       THEN least(1.0, CASE WHEN tw > 0 THEN 0.5 * tt * (weight / tw)
                            ELSE 0.0 END / source_tokens)
       ELSE 0.0 END AS rate
FROM w, wt
"""


def temperature_sample_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor counts per source under the temperature plan applied
    with the deterministic md5-bucket filter."""
    from ..operators.cleaning import temperature_mixture_plan

    docs = load_table(spark, sf_dir, "documents")
    plan = temperature_mixture_plan(docs, alpha=0.5, budget_frac=0.5)
    kept = apply_mixture(docs, plan, key="doc_id")
    return kept.groupBy("source").agg(
        F.count("*").cast("int").alias("kept_docs"),
        F.sum(bpe_ish_token_count("text")).cast("long").alias("kept_tokens"),
    )


TEMPERATURE_SAMPLE_SQL = f"""
WITH {_TEMP_CTE}, plan AS (
  SELECT source,
    CASE WHEN source_tokens > 0
         THEN least(1.0, CASE WHEN tw > 0 THEN 0.5 * tt * (weight / tw)
                              ELSE 0.0 END / source_tokens)
         ELSE 0.0 END AS rate
  FROM w, wt
), kept AS (
  SELECT d.source, {sql_bpe_ish_token_count('d.text')} AS toks
  FROM documents d JOIN plan p ON d.source = p.source
  WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
         % 1000000) < p.rate * 1000000.0
)
SELECT source, CAST(count(*) AS INTEGER) AS kept_docs,
  CAST(sum(toks) AS BIGINT) AS kept_tokens
FROM kept GROUP BY source
"""

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "decontaminate_documents": decontaminate_documents,
    "pii_redact_documents": pii_redact_documents,
    "mixture_plan_documents": mixture_plan_documents,
    "mixture_sample_summary": mixture_sample_summary,
    "temperature_mixture_plan_documents": temperature_mixture_plan_documents,
    "temperature_sample_summary": temperature_sample_summary,
    "classifier_scores_documents": classifier_scores_documents,
    "table_profile_lineitem": table_profile_lineitem,
}

ORACLE_SQL: dict[str, str] = {
    "classifier_scores_documents": _classifier_sql(),
    "decontaminate_documents": DECONTAMINATE_SQL,
    "pii_redact_documents": PII_REDACT_SQL,
    "mixture_plan_documents": MIXTURE_PLAN_SQL,
    "mixture_sample_summary": MIXTURE_SAMPLE_SQL,
    "temperature_mixture_plan_documents": TEMPERATURE_PLAN_SQL,
    "temperature_sample_summary": TEMPERATURE_SAMPLE_SQL,
    "table_profile_lineitem": TABLE_PROFILE_SQL,
}


def orders_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift of order value/customer-id between the 1995
    and 1996 order snapshots — the moment-based monitor a training
    pipeline runs between crawls (operators/cleaning.py::
    profile_drift)."""
    from ..operators.cleaning import profile_drift

    orders = load_table(spark, sf_dir, "orders")
    old = orders.where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    new = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    return profile_drift(old, new, ["o_totalprice", "o_custkey"])


def _drift_profile_sql(src: str) -> str:
    branches = []
    for c in ("o_totalprice", "o_custkey"):
        branches.append(f"""
  SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count({c}) AS BIGINT) AS non_null,
         avg(CAST({c} AS DOUBLE)) AS mean,
         stddev_samp(CAST({c} AS DOUBLE)) AS std,
         quantile_cont(CAST({c} AS DOUBLE), 0.5) AS p50
  FROM {src}""")
    return " UNION ALL ".join(branches)


ORDERS_VALUE_DRIFT_SQL = f"""
WITH o AS (
  SELECT * FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1996-01-01'
), n AS (
  SELECT * FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
), po AS ({_drift_profile_sql("o")}), pn AS ({_drift_profile_sql("n")})
SELECT po.col_name,
       1 - CAST(po.non_null AS DOUBLE) / po.n_rows AS null_rate_old,
       1 - CAST(pn.non_null AS DOUBLE) / pn.n_rows AS null_rate_new,
       (1 - CAST(pn.non_null AS DOUBLE) / pn.n_rows)
         - (1 - CAST(po.non_null AS DOUBLE) / po.n_rows) AS null_rate_delta,
       po.mean AS mean_old, pn.mean AS mean_new,
       (pn.mean - po.mean) / nullif(po.std, 0) AS mean_shift_sigmas,
       pn.std / nullif(po.std, 0) AS std_ratio,
       po.p50 AS p50_old, pn.p50 AS p50_new
FROM po JOIN pn USING (col_name)
"""

QUERIES["orders_value_drift"] = orders_value_drift
ORACLE_SQL["orders_value_drift"] = ORDERS_VALUE_DRIFT_SQL


def orders_price_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of order value, 1995 grid vs 1996
    population — per-bin terms; sum = PSI (operators/cleaning.py::
    psi_drift). The shape-drift twin of orders_value_drift."""
    from ..operators.cleaning import psi_drift

    orders = load_table(spark, sf_dir, "orders")
    old = orders.where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    new = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    return psi_drift(old, new, "o_totalprice", bins=10)


_PSI_EDGES = ", ".join(
    f"quantile_cont(x, {i / 10}) AS b{i}" for i in range(1, 10)
)
_PSI_BIN = "1 + " + " + ".join(f"CAST(x > b{i} AS INTEGER)" for i in range(1, 10))

ORDERS_PRICE_PSI_SQL = f"""
WITH o AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1996-01-01'
    AND o_totalprice IS NOT NULL
), nw AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
    AND o_totalprice IS NOT NULL
), e AS (
  SELECT {_PSI_EDGES} FROM o
), go AS (
  SELECT {_PSI_BIN} AS bin, CAST(count(*) AS BIGINT) AS n_old
  FROM o CROSS JOIN e GROUP BY 1
), gn AS (
  SELECT {_PSI_BIN} AS bin, CAST(count(*) AS BIGINT) AS n_new
  FROM nw CROSS JOIN e GROUP BY 1
), grid AS (
  SELECT CAST(unnest(range(1, 11)) AS INTEGER) AS bin
), j AS (
  SELECT bin, coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
  FROM grid LEFT JOIN go USING (bin) LEFT JOIN gn USING (bin)
), t AS (
  SELECT CAST(sum(n_old) AS DOUBLE) AS to_, CAST(sum(n_new) AS DOUBLE) AS tn
  FROM j
)
SELECT bin, n_old, n_new,
       greatest(n_old / to_, 1e-6) AS p_old,
       greatest(n_new / tn, 1e-6) AS p_new,
       (greatest(n_new / tn, 1e-6) - greatest(n_old / to_, 1e-6))
         * ln(greatest(n_new / tn, 1e-6) / greatest(n_old / to_, 1e-6))
         AS psi_term
FROM j CROSS JOIN t
"""

QUERIES["orders_price_psi"] = orders_price_psi
ORACLE_SQL["orders_price_psi"] = ORDERS_PRICE_PSI_SQL


def k_anonymity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of events under the quasi-identifier pair
    (event_type, value bucketed to hundreds) — how many equivalence
    classes are small enough to re-identify (operators/cleaning.py::
    k_anonymity_report)."""
    from ..operators.cleaning import k_anonymity_report

    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") / 100).alias("value_bucket")
    )
    return k_anonymity_report(events, ["event_type", "value_bucket"], k=10)


K_ANONYMITY_SQL = """
WITH g AS (
  SELECT event_type, floor(value / 100) AS value_bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT 10 AS k, CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_groups,
       CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
         AS violating_rows,
       coalesce(max(CASE WHEN n < 10 THEN n END), 0) AS max_violating_n
FROM g
"""

QUERIES["k_anonymity_events"] = k_anonymity_events
ORACLE_SQL["k_anonymity_events"] = K_ANONYMITY_SQL


def l_diversity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit: within each (event_type, hour-of-day)
    quasi-class, are there at least 3 distinct value buckets?
    (operators/cleaning.py::l_diversity_report — the content-side
    companion of k_anonymity_events)."""
    from ..operators.cleaning import l_diversity_report

    hour_of_day = (
        (F.col("ts") % 86_400_000_000_000) / 3_600_000_000_000
    ).cast("long")
    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        hour_of_day.alias("hour_of_day"),
        F.floor(F.col("value") / 100).alias("value_bucket"),
    )
    return l_diversity_report(
        events, ["event_type", "hour_of_day"], "value_bucket", l=3
    )


L_DIVERSITY_SQL = """
WITH vals AS (
  SELECT event_type,
         ((epoch_ns(ts) % 86400000000000) // 3600000000000) AS hour_of_day,
         floor(value / 100) AS value_bucket,
         count(*) AS c
  FROM events GROUP BY 1, 2, 3
),
groups AS (
  SELECT event_type, hour_of_day,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM vals GROUP BY 1, 2
)
SELECT 3 AS l,
  CAST(count(*) AS BIGINT) AS n_groups,
  CAST(sum(CASE WHEN n_distinct < 3 THEN 1 ELSE 0 END) AS BIGINT)
    AS violating_groups,
  CAST(sum(CASE WHEN n_distinct < 3 THEN n ELSE 0 END) AS BIGINT)
    AS violating_rows,
  min(n_distinct) AS min_distinct
FROM groups
"""

QUERIES["l_diversity_events"] = l_diversity_events
ORACLE_SQL["l_diversity_events"] = L_DIVERSITY_SQL


def wasserstein_price_by_flag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Earth-mover distance of each return flag's price distribution
    from the global one, in (floored) dollars
    (operators/cleaning.py::wasserstein_to_global)."""
    from ..operators.cleaning import wasserstein_to_global

    return wasserstein_to_global(
        load_table(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_returnflag",
        quantize=0,
    )


WASSERSTEIN_SQL = """
WITH rows0 AS (
  SELECT l_returnflag AS g,
         floor(CAST(l_extendedprice AS DOUBLE) * 1.0) / 1.0 AS v
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
),
cnt AS MATERIALIZED (
  SELECT g, v, CAST(count(*) AS DOUBLE) AS c FROM rows0 GROUP BY 1, 2
),
gval AS MATERIALIZED (SELECT v, sum(c) AS gc FROM cnt GROUP BY 1),
ng AS (SELECT g, sum(c) AS n FROM cnt GROUP BY 1),
tot AS (SELECT sum(gc) AS nn FROM gval),
grid AS (
  SELECT ng.g, gval.v, ng.n, gval.gc, coalesce(cnt.c, 0.0) AS c
  FROM ng CROSS JOIN gval
  LEFT JOIN cnt ON cnt.g = ng.g AND cnt.v = gval.v
),
stepped AS (
  SELECT g, n,
    abs(sum(c) OVER w / n - sum(gc) OVER w / (SELECT nn FROM tot))
      AS gap,
    coalesce(lead(v) OVER (PARTITION BY g ORDER BY v), v) - v AS dv
  FROM grid
  WINDOW w AS (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT g AS l_returnflag, CAST(any_value(n) AS BIGINT) AS n,
       sum(gap * dv) AS w1
FROM stepped GROUP BY 1
"""

QUERIES["wasserstein_price_by_flag"] = wasserstein_price_by_flag
ORACLE_SQL["wasserstein_price_by_flag"] = WASSERSTEIN_SQL


def t_closeness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit of events under the (event_type, hour-of-day)
    quasi-identifier with the bucketed value as the sensitive
    attribute (operators/cleaning.py::t_closeness_report, t = 0.02):
    classes whose value distribution sits more than t from the global
    one under ordered-attribute EMD. Completes the release-audit
    ladder next to k_anonymity_events (size) and l_diversity_events
    (variety); every EMD accumulates in ascending value order from
    integer counts, so the threshold can never flip on float drift."""
    from ..operators.cleaning import t_closeness_report

    hour_of_day = (
        (F.col("ts") % 86_400_000_000_000) / 3_600_000_000_000
    ).cast("long")
    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        hour_of_day.alias("hour_of_day"),
        F.floor(F.col("value") / 100).alias("value_bucket"),
    )
    return t_closeness_report(
        events, ["event_type", "hour_of_day"], "value_bucket", t=0.02
    )


T_CLOSENESS_SQL = """
WITH cnt AS (
  SELECT event_type,
         ((epoch_ns(ts) % 86400000000000) // 3600000000000) AS hod,
         floor(value / 100) AS v,
         CAST(count(*) AS DOUBLE) AS c
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
  GROUP BY 1, 2, 3
),
gval AS (SELECT v, sum(c) AS gc FROM cnt GROUP BY 1),
ng AS (SELECT event_type, hod, sum(c) AS n FROM cnt GROUP BY 1, 2),
tot AS (
  SELECT sum(gc) AS nn, CAST(count(*) AS DOUBLE) AS m FROM gval
),
grid AS (
  SELECT ng.event_type, ng.hod, gval.v, ng.n, gval.gc,
         coalesce(cnt.c, 0.0) AS c
  FROM ng CROSS JOIN gval
  LEFT JOIN cnt ON cnt.event_type = ng.event_type
               AND cnt.hod = ng.hod AND cnt.v = gval.v
),
stepped AS (
  SELECT event_type, hod, n, m,
    abs(sum(c) OVER w / n - sum(gc) OVER w / nn) AS gap
  FROM grid CROSS JOIN tot
  WINDOW w AS (PARTITION BY event_type, hod ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
emd AS (
  SELECT event_type, hod, any_value(n) AS n,
    CASE WHEN any_value(m) > 1.0
         THEN sum(gap) / (any_value(m) - 1.0) ELSE 0.0 END AS emd
  FROM stepped GROUP BY 1, 2
)
SELECT 0.02 AS t, CAST(count(*) AS BIGINT) AS n_groups,
  CAST(sum(CASE WHEN emd > 0.02 THEN 1 ELSE 0 END) AS BIGINT)
    AS violating_groups,
  CAST(sum(CASE WHEN emd > 0.02 THEN n ELSE 0.0 END) AS BIGINT)
    AS violating_rows,
  max(emd) AS max_emd
FROM emd
"""

QUERIES["t_closeness_events"] = t_closeness_events
ORACLE_SQL["t_closeness_events"] = T_CLOSENESS_SQL


_MOND_K, _MOND_DEPTH = 500, 3


def mondrian_cells_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian k-anonymous generalization of the (value, hour-of-day)
    quasi-identifier space (operators/cleaning.py::mondrian_generalize,
    k = 500, depth = 3): median-cut leaves with their published
    ranges. Every split decision is an order statistic or an integer
    count, so the cell structure is engine-exact by construction."""
    from ..operators.cleaning import mondrian_generalize

    hour_of_day = (
        (F.col("ts") % 86_400_000_000_000) / 3_600_000_000_000
    ).cast("long")
    ev = load_table(spark, sf_dir, "events").select(
        F.col("value"), hour_of_day.alias("hod")
    )
    return mondrian_generalize(
        ev, ["value", "hod"], k=_MOND_K, depth=_MOND_DEPTH
    )


def _mondrian_sql() -> str:
    k, depth = _MOND_K, _MOND_DEPTH
    parts = [
        """c0 AS (
  SELECT CAST(value AS DOUBLE) AS v1,
         ((epoch_ns(ts) % 86400000000000) // 3600000000000) AS v2,
         'r' AS cell
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
)"""
    ]
    for r in range(1, depth + 1):
        axis = "v1" if (r - 1) % 2 == 0 else "v2"
        parts.append(f"""rk{r} AS (
  SELECT v1, v2, cell,
    row_number() OVER (PARTITION BY cell ORDER BY {axis}) AS rn,
    count(*) OVER (PARTITION BY cell) AS n
  FROM c{r - 1}
)""")
        parts.append(f"""md{r} AS (
  SELECT cell, {axis} AS m FROM rk{r} WHERE rn = (n + 1) // 2
)""")
        parts.append(f"""ct{r} AS (
  SELECT t.cell, any_value(d.m) AS m,
         sum(CASE WHEN t.{axis} <= d.m THEN 1 ELSE 0 END) AS ln,
         count(*) AS n
  FROM rk{r} t JOIN md{r} d USING (cell)
  GROUP BY t.cell
)""")
        parts.append(f"""c{r} AS (
  SELECT t.v1, t.v2,
    CASE WHEN d.ln >= {k} AND d.n - d.ln >= {k}
         THEN t.cell ||
              (CASE WHEN t.{axis} <= d.m THEN 'L' ELSE 'R' END)
         ELSE t.cell END AS cell
  FROM c{r - 1} t JOIN ct{r} d USING (cell)
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT cell, CAST(count(*) AS BIGINT) AS n,
       min(v1) AS min_a1, max(v1) AS max_a1,
       min(v2) AS min_a2, max(v2) AS max_a2
FROM c{depth}
GROUP BY cell
"""
    )


QUERIES["mondrian_cells_events"] = mondrian_cells_events
ORACLE_SQL["mondrian_cells_events"] = _mondrian_sql()
