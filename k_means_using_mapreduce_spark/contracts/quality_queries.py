"""Data-quality contract queries (operators/quality.py): a declarative
constraint suite evaluated in one pass, and an exact equi-width
histogram. Rules include one that FAILS on the data (l_orderkey is not
unique in lineitem) so the violations path is value-checked, not just
the all-zeros happy path."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import (
    check_constraints,
    in_range,
    in_set,
    matches,
    not_null,
    numeric_histogram,
    unique,
)
from ..sources.loaders import load_table

_BINS = 20


def lineitem_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rules = [
        not_null("l_orderkey"),
        unique("l_orderkey"),  # fails: multiple lines per order
        in_range("l_quantity", 1, 50),
        in_range("l_discount", 0.0, 0.1),
        in_set("l_returnflag", ["A", "N", "R"]),
        matches("l_linestatus", "[OF]"),
    ]
    return check_constraints(li, rules)


_RULES_SQL = [
    ("l_orderkey_not_null", "l_orderkey",
     "sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)"),
    ("l_orderkey_unique", "l_orderkey",
     "count(*) - count(DISTINCT l_orderkey) "
     "- max(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)"),
    ("l_quantity_in_range", "l_quantity",
     "sum(CASE WHEN l_quantity IS NOT NULL AND l_quantity >= 1 "
     "AND l_quantity <= 50 THEN 0 ELSE 1 END)"),
    ("l_discount_in_range", "l_discount",
     "sum(CASE WHEN l_discount IS NOT NULL AND l_discount >= 0.0 "
     "AND l_discount <= 0.1 THEN 0 ELSE 1 END)"),
    ("l_returnflag_in_set", "l_returnflag",
     "sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END)"),
    ("l_linestatus_matches", "l_linestatus",
     "sum(CASE WHEN regexp_full_match(l_linestatus, '(?:[OF])') "
     "THEN 0 ELSE 1 END)"),
]

CONSTRAINTS_SQL = (
    "WITH agg AS (SELECT CAST(count(*) AS BIGINT) AS n, "
    + ", ".join(
        f"CAST(coalesce({expr}, 0) AS BIGINT) AS v{i}"
        for i, (_, _, expr) in enumerate(_RULES_SQL)
    )
    + " FROM lineitem) SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT '{name}' AS rule, '{col}' AS \"column\", n AS n_rows, "
        f"v{i} AS violations, v{i} = 0 AS passed FROM agg"
        for i, (name, col, _) in enumerate(_RULES_SQL)
    )
    + ")"
)


def price_histogram_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return numeric_histogram(li, "l_extendedprice", bins=_BINS)


HISTOGRAM_SQL = f"""
WITH bounds AS (
  SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
         CAST(max(l_extendedprice) AS DOUBLE) AS hi,
         (CAST(max(l_extendedprice) AS DOUBLE)
          - CAST(min(l_extendedprice) AS DOUBLE)) / {_BINS} AS width
  FROM lineitem
), bucketed AS (
  SELECT CAST(least(floor((CAST(l_extendedprice AS DOUBLE) - b.lo) / b.width),
                    {_BINS - 1}) AS INTEGER) AS bucket,
         b.lo AS blo, b.width AS bw
  FROM lineitem, bounds b WHERE l_extendedprice IS NOT NULL
)
SELECT bucket,
       any_value(blo) + bucket * any_value(bw) AS lo,
       any_value(blo) + (bucket + 1) * any_value(bw) AS hi,
       CAST(count(*) AS BIGINT) AS n
FROM bucketed GROUP BY bucket
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "lineitem_constraint_checks": lineitem_constraint_checks,
    "price_histogram_lineitem": price_histogram_lineitem,
}

ORACLE_SQL: dict[str, str] = {
    "lineitem_constraint_checks": CONSTRAINTS_SQL,
    "price_histogram_lineitem": HISTOGRAM_SQL,
}


def lexical_diversity_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type/token ratio and Yule's K per document — the
    length-insensitive repetitiveness filter (operators/quality.py::
    lexical_diversity)."""
    from ..operators.quality import lexical_diversity

    return lexical_diversity(load_table(spark, sf_dir, "documents"))


def _lexdiv_sql() -> str:
    from ._sql_text import sql_tokens

    return f"""
WITH toks AS (
  SELECT doc_id, unnest({sql_tokens("text")}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       count(*) / CAST(sum(tf) AS DOUBLE) AS ttr,
       10000.0 * (sum(tf * tf) - CAST(sum(tf) AS DOUBLE))
         / (CAST(sum(tf) AS DOUBLE) * CAST(sum(tf) AS DOUBLE)) AS yule_k
FROM tf GROUP BY doc_id
"""


LEXDIV_SQL = _lexdiv_sql()

QUERIES["lexical_diversity_documents"] = lexical_diversity_documents
ORACLE_SQL["lexical_diversity_documents"] = LEXDIV_SQL


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def key_discovery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery over orders profiling columns
    (operators/quality.py::key_candidates)."""
    from ..operators.quality import key_candidates
    from pyspark.sql import functions as F  # noqa: F401

    return key_candidates(
        load_table(spark, sf_dir, "orders"), _PROFILE_COLS
    )


def _stack_sql(cols: list[str]) -> str:
    parts = [
        f"SELECT '{c}' AS \"column\", CAST({c} AS VARCHAR) AS value "
        f"FROM orders WHERE {c} IS NOT NULL"
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


KEY_DISCOVERY_SQL = f"""
WITH tot AS (SELECT count(*) AS total FROM orders),
stacked AS (
{_stack_sql(_PROFILE_COLS)}
)
SELECT "column",
  CAST(count(*) AS BIGINT) AS n_nonnull,
  CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
  CASE WHEN count(DISTINCT value) = count(*)
        AND count(*) = (SELECT total FROM tot) THEN 1 ELSE 0 END AS is_key
FROM stacked GROUP BY 1
"""


def fd_discovery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact functional-dependency discovery over orders profiling
    columns (operators/quality.py::functional_dependencies)."""
    from ..operators.quality import functional_dependencies

    return functional_dependencies(
        load_table(spark, sf_dir, "orders"), _PROFILE_COLS
    )


def _fd_stack_sql(cols: list[str]) -> str:
    parts = []
    for a in cols:
        for b in cols:
            if a == b:
                continue
            parts.append(
                f"SELECT '{a}' AS det, '{b}' AS dep, "
                f"CAST({a} AS VARCHAR) AS dv, CAST({b} AS VARCHAR) AS pv "
                f"FROM orders WHERE {a} IS NOT NULL AND {b} IS NOT NULL"
            )
    return "\nUNION ALL\n".join(parts)


FD_DISCOVERY_SQL = f"""
WITH stacked AS (
{_fd_stack_sql(_PROFILE_COLS)}
)
SELECT det, dep,
  CAST(count(DISTINCT dv) AS BIGINT) AS n_det,
  CAST(count(DISTINCT (dv, pv)) AS BIGINT) AS n_pair,
  CAST(count(DISTINCT (dv, pv)) - count(DISTINCT dv) AS BIGINT)
    AS violations,
  CASE WHEN count(DISTINCT (dv, pv)) = count(DISTINCT dv)
       THEN 1 ELSE 0 END AS holds
FROM stacked GROUP BY 1, 2
"""

QUERIES["key_discovery_orders"] = key_discovery_orders
ORACLE_SQL["key_discovery_orders"] = KEY_DISCOVERY_SQL
QUERIES["fd_discovery_orders"] = fd_discovery_orders
ORACLE_SQL["fd_discovery_orders"] = FD_DISCOVERY_SQL


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over the four lineitem measures in
    one aggregation (operators/quality.py::correlation_matrix)."""
    from ..operators.quality import correlation_matrix

    return correlation_matrix(
        load_table(spark, sf_dir, "lineitem"), _CORR_COLS
    )


def spearman_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation matrix (midrank ties) over the same
    measures — monotone-association profiling."""
    from ..operators.quality import correlation_matrix

    return correlation_matrix(
        load_table(spark, sf_dir, "lineitem"), _CORR_COLS, method="spearman"
    )


def _corr_sql(spearman: bool) -> str:
    cols = _CORR_COLS
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    sel = ", ".join(f"CAST({c} AS DOUBLE) AS {c}" for c in cols)
    base = f"""b0 AS (
  SELECT {sel} FROM lineitem WHERE {notnull}
)"""
    if spearman:
        ranks = ", ".join(
            f"CAST(rank() OVER (ORDER BY {c}) AS DOUBLE)"
            f" + (CAST(count(*) OVER (PARTITION BY {c}) AS DOUBLE)"
            f" - 1.0) / 2.0 AS {c}"
            for c in cols
        )
        base += f",\nb AS (SELECT {ranks} FROM b0)"
    else:
        base += ",\nb AS (SELECT * FROM b0)"
    sums = ["CAST(count(*) AS DOUBLE) AS n"]
    for c in cols:
        sums.append(f"sum({c}) AS s_{c}")
        sums.append(f"sum({c} * {c}) AS q_{c}")
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    for a, c in pairs:
        sums.append(f"sum({a} * {c}) AS p_{a}_{c}")
    rows = " UNION ALL ".join(
        f"""SELECT '{a}' AS col_x, '{c}' AS col_y,
  CAST(n AS BIGINT) AS n,
  (n * p_{a}_{c} - s_{a} * s_{c})
    / nullif(sqrt((n * q_{a} - s_{a} * s_{a})
                  * (n * q_{c} - s_{c} * s_{c})), 0.0) AS corr
FROM s"""
        for a, c in pairs
    )
    return (
        "WITH "
        + base
        + ",\ns AS MATERIALIZED (SELECT "
        + ",\n  ".join(sums)
        + " FROM b)\n"
        + rows
    )


QUERIES["corr_matrix_lineitem"] = corr_matrix_lineitem
ORACLE_SQL["corr_matrix_lineitem"] = _corr_sql(spearman=False)
QUERIES["spearman_matrix_lineitem"] = spearman_matrix_lineitem
ORACLE_SQL["spearman_matrix_lineitem"] = _corr_sql(spearman=True)


def price_quantity_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of (quantity, extendedprice): line items not
    dominated on both axes (operators/quality.py::pareto_frontier)."""
    from ..operators.quality import pareto_frontier

    return pareto_frontier(
        load_table(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )


FRONTIER_SQL = """
WITH pairs AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY 1, 2
),
w AS (
  SELECT x, y, n_rows,
         max(y) OVER (ORDER BY x DESC, y DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM pairs
)
SELECT x AS l_quantity, y AS l_extendedprice, n_rows
FROM w WHERE prev_max IS NULL OR prev_max < y
"""

QUERIES["price_quantity_frontier"] = price_quantity_frontier
ORACLE_SQL["price_quantity_frontier"] = FRONTIER_SQL


def association_matrix_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between the categorical order fields (status,
    priority, order year) (operators/quality.py::association_matrix)."""
    from ..operators.quality import association_matrix

    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("string")
    )
    return association_matrix(
        o, ["o_orderstatus", "o_orderpriority", "o_year"]
    )


def _assoc_sql() -> str:
    cols = [
        ("o_orderstatus", "o_orderstatus"),
        ("o_orderpriority", "o_orderpriority"),
        ("o_year", "CAST(year(o_orderdate) AS VARCHAR)"),
    ]
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    arms = " UNION ALL ".join(
        f"""SELECT '{a_name}|{b_name}' AS pair,
  coalesce(CAST({a_expr} AS VARCHAR), '<null>') AS a,
  coalesce(CAST({b_expr} AS VARCHAR), '<null>') AS b
FROM orders"""
        for (a_name, a_expr), (b_name, b_expr) in pairs
    )
    return f"""
WITH long AS ({arms}),
cells AS MATERIALIZED (
  SELECT pair, a, b, CAST(count(*) AS DOUBLE) AS o
  FROM long GROUP BY 1, 2, 3
),
ma AS (SELECT pair, a, sum(o) AS na FROM cells GROUP BY 1, 2),
mb AS (SELECT pair, b, sum(o) AS nb FROM cells GROUP BY 1, 2),
nn AS (
  SELECT pair, sum(o) AS n,
         count(DISTINCT a) AS r, count(DISTINCT b) AS c
  FROM cells GROUP BY 1
),
per_pair AS (
  SELECT pair, any_value(n) AS n, any_value(r) AS r, any_value(c) AS c,
    sum((o - na * nb / n) * (o - na * nb / n) / (na * nb / n))
      AS chi2_obs,
    sum(na * nb / n) AS e_obs
  FROM cells
  JOIN ma USING (pair, a) JOIN mb USING (pair, b) JOIN nn USING (pair)
  GROUP BY 1
)
SELECT split_part(pair, '|', 1) AS col_x,
  split_part(pair, '|', 2) AS col_y,
  CAST(n AS BIGINT) AS n,
  chi2_obs + (n - e_obs) AS chi2,
  sqrt((chi2_obs + (n - e_obs))
       / nullif(n * CAST(least(r, c) - 1 AS DOUBLE), 0.0)) AS cramers_v
FROM per_pair
"""


QUERIES["association_matrix_orders"] = association_matrix_orders
ORACLE_SQL["association_matrix_orders"] = _assoc_sql()


def partial_corr_price_quantity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Price-quantity correlation with discount partialled out
    (operators/quality.py::partial_correlation)."""
    from ..operators.quality import partial_correlation

    return partial_correlation(
        load_table(spark, sf_dir, "lineitem"),
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )


PARTIAL_CORR_SQL = """
WITH s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
    sum(CAST(l_quantity AS DOUBLE)) AS sx,
    sum(CAST(l_extendedprice AS DOUBLE)) AS sy,
    sum(CAST(l_discount AS DOUBLE)) AS sz,
    sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)) AS sxx,
    sum(CAST(l_extendedprice AS DOUBLE)
        * CAST(l_extendedprice AS DOUBLE)) AS syy,
    sum(CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE)) AS szz,
    sum(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE))
      AS sxy,
    sum(CAST(l_quantity AS DOUBLE) * CAST(l_discount AS DOUBLE)) AS sxz,
    sum(CAST(l_extendedprice AS DOUBLE) * CAST(l_discount AS DOUBLE))
      AS syz
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL
),
c AS (
  SELECT n,
    (n * sxy - sx * sy)
      / nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0.0)
      AS r_xy,
    (n * sxz - sx * sz)
      / nullif(sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)), 0.0)
      AS r_xz,
    (n * syz - sy * sz)
      / nullif(sqrt((n * syy - sy * sy) * (n * szz - sz * sz)), 0.0)
      AS r_yz
  FROM s
)
SELECT CAST(n AS BIGINT) AS n, r_xy, r_xz, r_yz,
  (r_xy - r_xz * r_yz)
    / nullif(sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)), 0.0)
    AS r_xy_given_z
FROM c
"""

QUERIES["partial_corr_price_quantity"] = partial_corr_price_quantity
ORACLE_SQL["partial_corr_price_quantity"] = PARTIAL_CORR_SQL


def uncertainty_status_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Directional association: how much does order priority tell you
    about order status, and vice versa
    (operators/quality.py::uncertainty_coefficient)?"""
    from ..operators.quality import uncertainty_coefficient

    return uncertainty_coefficient(
        load_table(spark, sf_dir, "orders"), "o_orderstatus", "o_orderpriority"
    )


UNCERTAINTY_SQL = """
WITH cells AS (
  SELECT coalesce(CAST(o_orderstatus AS VARCHAR), '<null>') AS a,
         coalesce(CAST(o_orderpriority AS VARCHAR), '<null>') AS b,
         CAST(count(*) AS DOUBLE) AS c
  FROM orders GROUP BY 1, 2
),
ma AS (SELECT a, sum(c) AS na FROM cells GROUP BY 1),
mb AS (SELECT b, sum(c) AS nb FROM cells GROUP BY 1),
tot AS (SELECT sum(c) AS nn FROM cells),
j AS (
  SELECT c, na, nb, nn FROM cells
  JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot
),
agg AS (
  SELECT CAST(any_value(nn) AS BIGINT) AS n,
    sum((c / nn) * ln((c / nn) / ((na / nn) * (nb / nn))))
      AS mutual_info,
    -sum((c / nn) * ln(na / nn)) AS h_x,
    -sum((c / nn) * ln(nb / nn)) AS h_y
  FROM j
)
SELECT n, h_x, h_y, mutual_info,
  mutual_info / nullif(h_x, 0.0) AS u_x_given_y,
  mutual_info / nullif(h_y, 0.0) AS u_y_given_x
FROM agg
"""

QUERIES["uncertainty_status_priority"] = uncertainty_status_priority
ORACLE_SQL["uncertainty_status_priority"] = UNCERTAINTY_SQL


def part_type_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-criteria Pareto skyline over (brand, type) part groups
    (operators/quality.py::skyline): cheapest entry price, widest and
    narrowest size reach, deepest catalog — no single-axis top-k can
    answer it, and at d=4 the 2-D window trick
    (price_quantity_frontier) no longer applies. Criteria are ORDER
    STATISTICS (min/max/count), never sums, so both engines compare
    bit-identical values in the dominance predicate — the hbos ulp-tie
    lesson applied up front."""
    from ..operators.quality import skyline

    agg = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_brand", "p_type")
        .agg(
            F.min(F.col("p_retailprice").cast("double")).alias("min_price"),
            F.max("p_size").cast("long").alias("max_size"),
            F.min("p_size").cast("long").alias("min_size"),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )
    return skyline(
        agg,
        [
            ("min_price", "min"),
            ("max_size", "max"),
            ("min_size", "min"),
            ("n_parts", "max"),
        ],
    )


SKYLINE_SQL = """
WITH agg AS (
  SELECT p_brand, p_type,
         min(CAST(p_retailprice AS DOUBLE)) AS min_price,
         CAST(max(p_size) AS BIGINT) AS max_size,
         CAST(min(p_size) AS BIGINT) AS min_size,
         count(*) AS n_parts
  FROM part GROUP BY 1, 2
)
SELECT p_brand, p_type, min_price, max_size, min_size, n_parts
FROM agg a
WHERE NOT EXISTS (
  SELECT 1 FROM agg b
  WHERE b.min_price <= a.min_price AND b.max_size >= a.max_size
    AND b.min_size <= a.min_size AND b.n_parts >= a.n_parts
    AND (b.min_price < a.min_price OR b.max_size > a.max_size
         OR b.min_size < a.min_size OR b.n_parts > a.n_parts)
)
"""

QUERIES["part_type_skyline"] = part_type_skyline
ORACLE_SQL["part_type_skyline"] = SKYLINE_SQL


def gopher_rules_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher-rule triage (operators/quality.py::
    gopher_rules + gopher_summary): how many documents each named
    quality rule rejects and how many survive the battery — the
    corpus-cleaning report every LLM pipeline starts from."""
    from ..operators.quality import gopher_rules, gopher_summary

    docs = load_table(spark, sf_dir, "documents")
    return gopher_summary(gopher_rules(docs), by="source")


def _gopher_sql() -> str:
    from ..functions.text import QUALITY_STOPWORDS
    from ._sql_text import (
        sql_alpha_ratio,
        sql_mean_token_len,
        sql_stopword_count,
        sql_token_count,
    )

    n = f"CAST({sql_token_count('text')} AS DOUBLE)"
    mean_len = sql_mean_token_len("text")
    hash_cnt = (
        "CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)"
    )
    ell_cnt = (
        "CAST((length(text) - length(replace(text, '...', ''))) / 3"
        " AS DOUBLE)"
    )
    sym_ratio = (
        f"(CASE WHEN {n} > 0 THEN ({hash_cnt} + {ell_cnt}) / {n} "
        "ELSE 0.0 END)"
    )
    lines = (
        "list_filter(string_split(text, chr(10)), l -> trim(l) <> '')"
    )
    nl = f"CAST(len({lines}) AS DOUBLE)"
    bullets = (
        f"CAST(len(list_filter({lines}, l -> starts_with(ltrim(l), '- ')"
        " OR starts_with(ltrim(l), '* '))) AS DOUBLE)"
    )
    ell_lines = (
        f"CAST(len(list_filter({lines}, l -> ends_with(rtrim(l), '...')))"
        " AS DOUBLE)"
    )
    bullet_ratio = f"(CASE WHEN {nl} > 0 THEN {bullets} / {nl} ELSE 0.0 END)"
    ell_line_ratio = (
        f"(CASE WHEN {nl} > 0 THEN {ell_lines} / {nl} ELSE 0.0 END)"
    )
    flags = {
        "r_word_count": f"({n} >= 50.0 AND {n} <= 100000.0)",
        "r_mean_len": (
            f"({mean_len} IS NOT NULL AND {mean_len} >= 3.0"
            f" AND {mean_len} <= 10.0)"
        ),
        "r_symbol": f"({sym_ratio} <= 0.1)",
        "r_bullet": f"({bullet_ratio} <= 0.9)",
        "r_ellipsis": f"({ell_line_ratio} <= 0.3)",
        "r_alpha": f"({sql_alpha_ratio('text')} >= 0.6)",
        "r_stopword": (
            f"({sql_stopword_count('text', QUALITY_STOPWORDS)} >= 2)"
        ),
    }
    flag_cols = ",\n    ".join(f"{e} AS {k}" for k, e in flags.items())
    fails = ",\n  ".join(
        f"CAST(sum(CASE WHEN NOT {k} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS fail_{k[2:]}"
        for k in flags
    )
    pass_all = " AND ".join(flags)
    return f"""
WITH flagged AS (
  SELECT source,
    {flag_cols},
    ({pass_all}) AS pass_all
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  {fails},
  CAST(sum(CASE WHEN pass_all THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM flagged GROUP BY source
"""


QUERIES["gopher_rules_documents"] = gopher_rules_documents
ORACLE_SQL["gopher_rules_documents"] = _gopher_sql()


_IND_ATTRS = (
    ("c_custkey", "customer"),
    ("o_custkey", "orders"),
    ("o_orderkey", "orders"),
    ("l_orderkey", "lineitem"),
    ("l_partkey", "lineitem"),
    ("p_partkey", "part"),
    ("l_suppkey", "lineitem"),
    ("s_suppkey", "supplier"),
    ("c_nationkey", "customer"),
    ("s_nationkey", "supplier"),
    ("n_nationkey", "nation"),
    ("n_regionkey", "nation"),
    ("r_regionkey", "region"),
)


def ind_discovery_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unary inclusion-dependency discovery over the 13 TPC-H key
    attributes (operators/quality.py::inclusion_dependencies): one
    value-keyed attribute-set aggregation decides values(A) ⊆
    values(B) for every ordered pair — recovering the schema's
    foreign-key skeleton (o_custkey ⊆ c_custkey, l_orderkey ⊆
    o_orderkey, n_regionkey ⊆ r_regionkey, …) from data alone."""
    from ..operators.quality import inclusion_dependencies

    sources = {
        attr: (load_table(spark, sf_dir, table), attr)
        for attr, table in _IND_ATTRS
    }
    return inclusion_dependencies(sources)


def _ind_sql() -> str:
    selects = [
        f"SELECT '{attr}' AS a, CAST({attr} AS VARCHAR) AS v "
        f"FROM {table} WHERE {attr} IS NOT NULL GROUP BY 2"
        for attr, table in _IND_ATTRS
    ]
    vals = "\n  UNION ALL\n  ".join(selects)
    return f"""
WITH vals AS MATERIALIZED (
  {vals}
),
pairs AS (
  SELECT x.a AS lhs, y.a AS rhs, CAST(count(*) AS BIGINT) AS shared_values
  FROM vals x JOIN vals y ON x.v = y.v AND x.a <> y.a
  GROUP BY 1, 2
),
counts AS (
  SELECT a AS lhs, CAST(count(*) AS BIGINT) AS lhs_values
  FROM vals GROUP BY 1
)
SELECT p.lhs, p.rhs, c.lhs_values, p.shared_values,
       p.shared_values = c.lhs_values AS contained
FROM pairs p JOIN counts c USING (lhs)
"""


QUERIES["ind_discovery_tpch"] = ind_discovery_tpch
ORACLE_SQL["ind_discovery_tpch"] = _ind_sql()


#: level-2 composite attributes: every within-table pair of the
#: unary lattice's key columns (data-independent candidate set, so
#: the oracle is static SQL; pruning-by-unary-survivors is the scale
#: path documented on the operator)
_IND2_ATTRS = (
    ("c_custkey+c_nationkey", "customer", ("c_custkey", "c_nationkey")),
    ("o_custkey+o_orderkey", "orders", ("o_custkey", "o_orderkey")),
    ("l_orderkey+l_partkey", "lineitem", ("l_orderkey", "l_partkey")),
    ("l_orderkey+l_suppkey", "lineitem", ("l_orderkey", "l_suppkey")),
    ("l_partkey+l_suppkey", "lineitem", ("l_partkey", "l_suppkey")),
    ("s_suppkey+s_nationkey", "supplier", ("s_suppkey", "s_nationkey")),
    ("n_nationkey+n_regionkey", "nation", ("n_nationkey", "n_regionkey")),
)


def ind_nary_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-2 composite IND verification over the within-table pairs
    of the TPC-H key lattice (operators/quality.py::
    nary_inclusion_dependencies): one value-TUPLE-keyed attribute-set
    aggregation decides (A₁,A₂) ⊆ (B₁,B₂) for every ordered composite
    pair. On this schema the result is the PRUNING story: the dense
    integer keys make dozens of unary INDs hold coincidentally, and
    the level-2 pass refutes every composite candidate they imply —
    exactly the spurious-FK elimination the lattice level exists for."""
    from ..operators.quality import nary_inclusion_dependencies

    sources = {
        label: (load_table(spark, sf_dir, table), list(cols))
        for label, table, cols in _IND2_ATTRS
    }
    return nary_inclusion_dependencies(sources)


def _ind2_sql() -> str:
    selects = [
        f"SELECT '{label}' AS a, CAST({c1} AS VARCHAR) AS v0, "
        f"CAST({c2} AS VARCHAR) AS v1 "
        f"FROM {table} WHERE {c1} IS NOT NULL AND {c2} IS NOT NULL "
        "GROUP BY 2, 3"
        for label, table, (c1, c2) in _IND2_ATTRS
    ]
    vals = "\n  UNION ALL\n  ".join(selects)
    return f"""
WITH vals AS MATERIALIZED (
  {vals}
),
pairs AS (
  SELECT x.a AS lhs, y.a AS rhs, CAST(count(*) AS BIGINT) AS shared_values
  FROM vals x JOIN vals y ON x.v0 = y.v0 AND x.v1 = y.v1 AND x.a <> y.a
  GROUP BY 1, 2
),
counts AS (
  SELECT a AS lhs, CAST(count(*) AS BIGINT) AS lhs_values
  FROM vals GROUP BY 1
)
SELECT p.lhs, p.rhs, c.lhs_values, p.shared_values,
       p.shared_values = c.lhs_values AS contained
FROM pairs p JOIN counts c USING (lhs)
"""


QUERIES["ind_nary_tpch"] = ind_nary_tpch
ORACLE_SQL["ind_nary_tpch"] = _ind2_sql()


#: level-3 lattice over lineitem's key triple across three named
#: sub-relations — the data-lake profiling question "is extract X
#: loadable as a composite FK into master Y". The level-2 survivor
#: set is STATIC for this lattice (subset relations hold coordinate-
#: wise by construction; the two extracts are mutually incomparable),
#: which keeps the oracle static SQL — the same static-lattice recipe
#: the level-2 contract uses.
_IND3_COLS = ("l_orderkey", "l_partkey", "l_suppkey")
_IND3_RELS = (
    ("li_all", None),
    ("li_return", "l_returnflag = 'R'"),
    ("li_1994", "year(l_shipdate) = 1994"),
)
#: verified level-2 INDs of this lattice: every column pair of each
#: extract is contained in the master's same pair
_IND3_L2_SURVIVORS = tuple(
    ((sub, (c1, c2)), ("li_all", (c1, c2)))
    for sub in ("li_return", "li_1994")
    for i1, c1 in enumerate(_IND3_COLS)
    for c2 in _IND3_COLS[i1 + 1 :]
)


def ind_nary_l3_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-3 IND lattice walk (round-8 verdict item 9): MIND-style
    Apriori candidate generation over the level-2 survivors
    (operators/quality.py::ind_apriori_candidates) names the composite
    attributes whose triple projections all hold — here the two
    extract→master candidates — and the generic SPIDER value-tuple
    pass (nary_inclusion_dependencies, arity 3) verifies every ordered
    pair among them. Expected shape: the true INDs (each extract's key
    triple ⊆ the master's) verify contained=true; the extract-vs-
    extract and master-vs-extract pairs share tuples but are refuted
    with exact shared counts — the pruning story one level up."""
    from ..operators.quality import (
        ind_apriori_candidates,
        nary_inclusion_dependencies,
    )

    cands = ind_apriori_candidates(list(_IND3_L2_SURVIVORS))
    # relations named by any surviving level-3 candidate (both sides)
    rels = sorted(
        {side[0] for cand in cands for side in cand}
    )
    li = load_table(spark, sf_dir, "lineitem")
    filters = dict(_IND3_RELS)
    sources = {
        rel: (
            li.where(filters[rel]) if filters[rel] else li,
            list(_IND3_COLS),
        )
        for rel in rels
    }
    return nary_inclusion_dependencies(sources)


def _ind3_sql() -> str:
    selects = [
        f"SELECT '{label}' AS a, CAST(l_orderkey AS VARCHAR) AS v0, "
        "CAST(l_partkey AS VARCHAR) AS v1, "
        "CAST(l_suppkey AS VARCHAR) AS v2 "
        "FROM lineitem WHERE l_orderkey IS NOT NULL "
        "AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL"
        + (f" AND {where}" if where else "")
        + " GROUP BY 2, 3, 4"
        for label, where in _IND3_RELS
    ]
    vals = "\n  UNION ALL\n  ".join(selects)
    return f"""
WITH vals AS MATERIALIZED (
  {vals}
),
pairs AS (
  SELECT x.a AS lhs, y.a AS rhs, CAST(count(*) AS BIGINT) AS shared_values
  FROM vals x JOIN vals y
    ON x.v0 = y.v0 AND x.v1 = y.v1 AND x.v2 = y.v2 AND x.a <> y.a
  GROUP BY 1, 2
),
counts AS (
  SELECT a AS lhs, CAST(count(*) AS BIGINT) AS lhs_values
  FROM vals GROUP BY 1
)
SELECT p.lhs, p.rhs, c.lhs_values, p.shared_values,
       p.shared_values = c.lhs_values AS contained
FROM pairs p JOIN counts c USING (lhs)
"""


QUERIES["ind_nary_l3_tpch"] = ind_nary_l3_tpch
ORACLE_SQL["ind_nary_l3_tpch"] = _ind3_sql()


def fd_nary_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-determinant FD discovery over the orders profiling
    columns (operators/quality.py::nary_functional_dependencies):
    for every column pair (A,B) and dependent C, does (A,B) → C hold,
    with TANE's minimality flag (implied_by_unary) marking the FDs a
    single determinant already explains — on this schema every held
    composite is implied by o_orderkey being a key, which is exactly
    the redundancy the flag exists to expose."""
    from ..operators.quality import nary_functional_dependencies

    return nary_functional_dependencies(
        load_table(spark, sf_dir, "orders"), _PROFILE_COLS
    )


def _fd_nary_sql(cols: list[str]) -> str:
    cands = [
        (a, b, c)
        for i, a in enumerate(cols)
        for b in cols[i + 1 :]
        for c in cols
        if c != a and c != b
    ]
    tri_parts = []
    for a, b, c in cands:
        tri_parts.append(
            f"""SELECT '{a}' AS det_a, '{b}' AS det_b, '{c}' AS dep,
  CAST(count(*) AS BIGINT) AS n_groups,
  COALESCE(CAST(sum(cnt) AS BIGINT), 0) AS n_triples
FROM (
  SELECT da, db, count(*) AS cnt FROM (
    SELECT DISTINCT CAST({a} AS VARCHAR) AS da,
           CAST({b} AS VARCHAR) AS db, CAST({c} AS VARCHAR) AS dc
    FROM orders
    WHERE {a} IS NOT NULL AND {b} IS NOT NULL AND {c} IS NOT NULL
  ) GROUP BY 1, 2)"""
        )
    un_parts = []
    for x in cols:
        for c in cols:
            if x == c:
                continue
            un_parts.append(
                f"""SELECT '{x}' AS det, '{c}' AS dep,
  CAST(count(*) = count(DISTINCT da) AS INT) AS uh
FROM (
  SELECT DISTINCT CAST({x} AS VARCHAR) AS da, CAST({c} AS VARCHAR) AS dc
  FROM orders WHERE {x} IS NOT NULL AND {c} IS NOT NULL)"""
            )
    tri = "\nUNION ALL\n".join(tri_parts)
    un = "\nUNION ALL\n".join(un_parts)
    return f"""
WITH tri AS MATERIALIZED (
{tri}
),
un AS MATERIALIZED (
{un}
)
SELECT t.det_a, t.det_b, t.dep, t.n_groups, t.n_triples,
       t.n_triples - t.n_groups AS violations,
       CAST(t.n_triples = t.n_groups AS INT) AS holds,
       CAST(ua.uh + ub.uh > 0 AS INT) AS implied_by_unary
FROM tri t
JOIN un ua ON ua.det = t.det_a AND ua.dep = t.dep
JOIN un ub ON ub.det = t.det_b AND ub.dep = t.dep
"""


QUERIES["fd_nary_orders"] = fd_nary_orders
ORACLE_SQL["fd_nary_orders"] = _fd_nary_sql(_PROFILE_COLS)


_AFD_MAX_ERROR = 0.05


def afd_discovery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate (g3) FD discovery over the orders profiling columns
    (operators/quality.py::approximate_fds): for every ordered pair,
    the minimum row-removal fraction for det → dep to hold exactly,
    with holds = error <= 5% — the tolerant reading of
    fd_discovery_orders that survives real-world entry noise."""
    from ..operators.quality import approximate_fds

    return approximate_fds(
        load_table(spark, sf_dir, "orders"),
        _PROFILE_COLS,
        max_error=_AFD_MAX_ERROR,
    )


def _afd_sql(cols: list[str], max_error: float) -> str:
    parts = []
    for a in cols:
        for b in cols:
            if a == b:
                continue
            parts.append(
                f"""SELECT '{a}' AS det, '{b}' AS dep, keep, n FROM (
  SELECT CAST(sum(mx) AS BIGINT) AS keep, CAST(sum(s) AS BIGINT) AS n
  FROM (
    SELECT max(c) AS mx, sum(c) AS s FROM (
      SELECT CAST({a} AS VARCHAR) AS dv, CAST({b} AS VARCHAR) AS pv,
             count(*) AS c
      FROM orders WHERE {a} IS NOT NULL AND {b} IS NOT NULL
      GROUP BY 1, 2) GROUP BY dv))"""
            )
    stacked = "\nUNION ALL\n".join(parts)
    return f"""
WITH per_pair AS MATERIALIZED (
{stacked}
)
SELECT det, dep, n, keep,
       1.0 - CAST(keep AS DOUBLE) / CAST(n AS DOUBLE) AS error,
       (1.0 - CAST(keep AS DOUBLE) / CAST(n AS DOUBLE)) <= {max_error!r}
         AS holds
FROM per_pair
"""


QUERIES["afd_discovery_orders"] = afd_discovery_orders
ORACLE_SQL["afd_discovery_orders"] = _afd_sql(_PROFILE_COLS, _AFD_MAX_ERROR)


def cfd_orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant conditional-FD check (operators/quality.py::
    conditional_fds): within each o_orderstatus partition, does
    o_custkey → o_orderpriority hold? Per condition value: distinct
    determinants, violation count (repair distance), holds flag."""
    from ..operators.quality import conditional_fds

    return conditional_fds(
        load_table(spark, sf_dir, "orders"),
        "o_custkey",
        "o_orderpriority",
        "o_orderstatus",
    )


CFD_ORDERS_SQL = """
WITH triples AS (
  SELECT CAST(o_orderstatus AS VARCHAR) AS cv,
         CAST(o_custkey AS VARCHAR) AS dv,
         CAST(o_orderpriority AS VARCHAR) AS bv,
         count(*) AS rows_
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_custkey IS NOT NULL
    AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2, 3
),
per_det AS (
  SELECT cv, dv, count(*) AS n_dep_vals, sum(rows_) AS rows_
  FROM triples GROUP BY 1, 2
)
SELECT cv AS cond_value,
       CAST(sum(rows_) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_det,
       CAST(sum(n_dep_vals) - count(*) AS BIGINT) AS violations,
       (sum(n_dep_vals) - count(*)) = 0 AS holds
FROM per_det GROUP BY 1
"""

QUERIES["cfd_orders_by_status"] = cfd_orders_by_status
ORACLE_SQL["cfd_orders_by_status"] = CFD_ORDERS_SQL


_WALK_COLS = ("l_orderkey", "l_partkey")
_WALK_RELS = (("li_all", None), ("li_return", "l_returnflag = 'R'"))
_WALK_MAX_LEVEL = len(_WALK_COLS)


def ind_lattice_walk_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MIND fixpoint (operators/quality.py::ind_lattice_walk)
    over a 2-relation / 2-column scope: level 1 verified exhaustively,
    level 2 generated by Apriori from the survivors and verified, the
    walk terminating at the natural fixpoint (no level-3 candidates
    exist over 2 columns). One SPIDER job per level — the deeper
    single-level machinery is contracted separately
    (ind_nary_tpch / ind_nary_l3_tpch); this entry gates the LOOP:
    candidate generation, per-level verification, and the stop rule,
    including the dense-integer spurious unary INDs that the level-2
    pass refutes."""
    from ..operators.quality import ind_lattice_walk

    li = load_table(spark, sf_dir, "lineitem")
    sources = {
        rel: (li.where(w) if w else li, list(_WALK_COLS))
        for rel, w in _WALK_RELS
    }
    return ind_lattice_walk(sources)


def _walk_sql(rels, cols, max_level: int) -> str:
    """Data-independent oracle for the walk: enumerate EVERY canonical
    candidate at every level (lhs strictly increasing, rhs any
    duplicate-free permutation) and emit the contained ones. By
    Apriori soundness a true level-n IND has all its projections true,
    so the walk's pruning never drops a true IND — full enumeration
    filtered on containment equals the walk's output exactly, without
    reproducing the level-by-level loop in SQL. Soundness requires
    NULL-free profiled columns (the walk docstring's MIND caveat);
    l_orderkey/l_partkey are NOT NULL in TPC-H, so the equivalence is
    exact on this scope."""
    from itertools import combinations, permutations

    def cte(rel: str, sub: "tuple[str, ...]") -> str:
        return f"d_{rel}_{'_'.join(sub)}"

    subsets = [
        sub
        for n in range(1, max_level + 1)
        for sub in combinations(cols, n)
    ]
    ctes = []
    for rel, where in rels:
        for sub in subsets:
            notnull = " AND ".join(f"{c} IS NOT NULL" for c in sub)
            w = f"({where}) AND " if where else ""
            ctes.append(
                f"{cte(rel, sub)} AS MATERIALIZED (SELECT DISTINCT "
                f"{', '.join(sub)} FROM lineitem WHERE {w}{notnull})"
            )
    blocks = []
    for n in range(1, max_level + 1):
        for lrel, _ in rels:
            for lsub in combinations(cols, n):
                for rrel, _ in rels:
                    for rperm in permutations(cols, n):
                        if (lrel, lsub) == (rrel, rperm):
                            continue
                        lc, rc = cte(lrel, lsub), cte(
                            rrel, tuple(sorted(rperm))
                        )
                        blocks.append(
                            f"SELECT CAST({n} AS INTEGER) AS level, "
                            f"'{lrel}' AS lhs_rel, "
                            f"'{','.join(lsub)}' AS lhs_cols, "
                            f"'{rrel}' AS rhs_rel, "
                            f"'{','.join(rperm)}' AS rhs_cols, "
                            f"(SELECT CAST(count(*) AS BIGINT) FROM {lc})"
                            " AS n_values"
                            f"\nWHERE (SELECT count(*) FROM {lc}) > 0"
                            f"\n  AND (SELECT count(*) FROM "
                            f"(SELECT {', '.join(lsub)} FROM {lc} "
                            f"INTERSECT SELECT {', '.join(rperm)} "
                            f"FROM {rc}))"
                            f" = (SELECT count(*) FROM {lc})"
                        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(blocks)
    )


QUERIES["ind_lattice_walk_tpch"] = ind_lattice_walk_tpch
ORACLE_SQL["ind_lattice_walk_tpch"] = _walk_sql(
    _WALK_RELS, _WALK_COLS, _WALK_MAX_LEVEL
)
