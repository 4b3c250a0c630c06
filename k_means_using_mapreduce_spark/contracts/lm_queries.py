"""Unigram-LM scoring contract (operators/lm.py): the CCNet-style
perplexity-filter shape, self-scored (model fit on the corpus itself,
so every token is in-vocabulary and the oracle needs no unknown-mass
branch)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.lm import fit_unigram_model, score_documents, source_divergence
from ..sources.loaders import load_table
from ._sql_text import sql_tokens


def unigram_logprob_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    model = fit_unigram_model(docs)
    return score_documents(docs, model)


UNIGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS token FROM documents
), counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY token
), tot AS (
  SELECT sum(n) AS total, count(*) AS vocab FROM counts
), model AS (
  SELECT token, ln((n + 1.0) / (total + 1.0 * (vocab + 1.0))) AS logprob
  FROM counts, tot
)
SELECT t.doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  sum(m.logprob) AS logprob_sum,
  avg(m.logprob) AS avg_logprob
FROM toks t JOIN model m USING (token)
GROUP BY t.doc_id
"""


def source_divergence_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return source_divergence(docs)


DIVERGENCE_SQL = f"""
WITH toks AS (
  SELECT source AS grp, unnest({sql_tokens('text')}) AS token FROM documents
), gcounts AS (
  SELECT grp, token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2
), corpus AS (
  SELECT token, sum(n) AS cn FROM gcounts GROUP BY 1
), tot AS (
  SELECT sum(cn) AS ct FROM corpus
), gt AS (
  SELECT grp, sum(n) AS gtot FROM gcounts GROUP BY 1
)
SELECT g.grp AS source,
  CAST(any_value(gt.gtot) AS BIGINT) AS n_tokens,
  -sum((g.n / gt.gtot) * ln(g.n / gt.gtot)) AS entropy,
  sum((g.n / gt.gtot) * ln((g.n / gt.gtot) / (c.cn / t.ct))) AS kl_corpus
FROM gcounts g JOIN corpus c USING (token) JOIN gt USING (grp), tot t
GROUP BY g.grp
"""


_LAM = 0.7


def bigram_logprob_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import fit_bigram_model, score_documents_bigram

    docs = load_table(spark, sf_dir, "documents")
    return score_documents_bigram(
        docs, fit_bigram_model(docs), fit_unigram_model(docs), lam=_LAM
    )


# literals via repr(): 1.0 - 0.7 is 0.30000000000000004, not 0.3 — the
# oracle must mix with the SAME double the Spark expression folds in
BIGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens('text')} AS t FROM documents
), pr0 AS (
  SELECT doc_id, t, unnest(range(0, len(t) - 1)) AS i FROM toks
), pairs AS (
  SELECT doc_id, t[CAST(i AS INTEGER) + 1] AS w1,
                 t[CAST(i AS INTEGER) + 2] AS w2
  FROM pr0
), big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM pairs GROUP BY 1, 2
), marg AS (
  SELECT w1, sum(n12) AS n1 FROM big GROUP BY 1
), ucount AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest({sql_tokens('text')}) AS token FROM documents)
  GROUP BY 1
), tot AS (
  SELECT sum(n) AS total, count(*) AS vocab FROM ucount
), uni AS (
  SELECT token, (n + 1.0) / (total + 1.0 * (vocab + 1.0)) AS q
  FROM ucount, tot
), firsts AS (
  SELECT f.doc_id, ln(u.q) AS lp
  FROM (SELECT doc_id, t[1] AS token FROM toks WHERE len(t) > 0) f
  JOIN uni u USING (token)
), pair_scores AS (
  SELECT p.doc_id,
    ln({_LAM!r} * coalesce(b.n12 / m.n1, 0.0)
       + {1.0 - _LAM!r} * exp(ln(u.q))) AS lp
  FROM pairs p
  LEFT JOIN big b USING (w1, w2)
  LEFT JOIN marg m ON p.w1 = m.w1
  JOIN uni u ON p.w2 = u.token
), allscores AS (
  SELECT doc_id, lp FROM firsts UNION ALL SELECT doc_id, lp FROM pair_scores
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       sum(lp) AS logprob_sum, avg(lp) AS avg_logprob
FROM allscores GROUP BY doc_id
"""




def collocations_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocations over the documents corpus (min_count=5) —
    association-ranked bigram types for phrase mining."""
    from ..operators.lm import collocations

    return collocations(load_table(spark, sf_dir, "documents"), min_count=5)


COLLOCATIONS_SQL = f"""
WITH toks AS (
  SELECT {sql_tokens('text')} AS t FROM documents
), pr0 AS (
  SELECT t, unnest(range(0, len(t) - 1)) AS i FROM toks
), pairs AS (
  SELECT t[CAST(i AS INTEGER) + 1] AS w1,
         t[CAST(i AS INTEGER) + 2] AS w2
  FROM pr0
), big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM pairs GROUP BY 1, 2
), pred AS (
  -- CAST: DuckDB sums BIGINT to HUGEINT (int128); the driver's value
  -- canon renders HUGEINT via float ("11.0") vs Spark's long ("11"),
  -- which hash-mismatched in round 3 despite identical values.
  SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM big GROUP BY 1
), succ AS (
  SELECT w2, CAST(sum(n12) AS BIGINT) AS n2 FROM big GROUP BY 1
), tot AS (
  SELECT CAST(sum(n12) AS DOUBLE) AS N FROM big
)
SELECT b.w1, b.w2, b.n12, p.n1, s.n2,
       ln(CAST(b.n12 AS DOUBLE) * N / (CAST(p.n1 AS DOUBLE) * s.n2)) AS pmi
FROM big b
JOIN pred p USING (w1)
JOIN succ s USING (w2)
CROSS JOIN tot
WHERE b.n12 >= 5
"""

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "unigram_logprob_documents": unigram_logprob_documents,
    "source_divergence_documents": source_divergence_documents,
    "bigram_logprob_documents": bigram_logprob_documents,
    "collocations_documents": collocations_documents,
}

ORACLE_SQL: dict[str, str] = {
    "unigram_logprob_documents": UNIGRAM_SQL,
    "source_divergence_documents": DIVERGENCE_SQL,
    "bigram_logprob_documents": BIGRAM_SQL,
    "collocations_documents": COLLOCATIONS_SQL,
}


KN_DISCOUNT = 0.75


def kneser_ney_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities over the corpus —
    absolute discounting + continuation-probability backoff
    (operators/lm.py::kneser_ney_bigrams)."""
    from ..operators.lm import kneser_ney_bigrams

    return kneser_ney_bigrams(
        load_table(spark, sf_dir, "documents"), discount=KN_DISCOUNT
    )


KNESER_NEY_SQL = f"""
WITH toks AS (
  SELECT {sql_tokens('text')} AS t FROM documents
), pr0 AS (
  SELECT t, unnest(range(0, len(t) - 1)) AS i FROM toks
), pairs AS (
  SELECT t[CAST(i AS INTEGER) + 1] AS w1,
         t[CAST(i AS INTEGER) + 2] AS w2
  FROM pr0
), big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM pairs GROUP BY 1, 2
), marg AS (
  SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM big GROUP BY 1
), succ AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS t1 FROM big GROUP BY 1
), pred AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS t2 FROM big GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS tt FROM big
)
SELECT b.w1, b.w2, b.n12, m.n1,
       greatest(b.n12 - {KN_DISCOUNT}, 0.0) / m.n1
         + ({KN_DISCOUNT} * s.t1 / m.n1) * (p.t2 / tt) AS p_kn
FROM big b
JOIN marg m USING (w1)
JOIN succ s USING (w1)
JOIN pred p USING (w2)
CROSS JOIN tot
"""

QUERIES["kneser_ney_documents"] = kneser_ney_documents
ORACLE_SQL["kneser_ney_documents"] = KNESER_NEY_SQL


def kn_logprob_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-scored Kneser-Ney document log-likelihood — the smoothed
    perplexity-filter; every pair is observed (model fit on the same
    corpus) so the oracle needs no backoff branches."""
    from ..operators.lm import kneser_ney_bigrams, score_documents_kn

    docs = load_table(spark, sf_dir, "documents")
    kn = kneser_ney_bigrams(docs, discount=KN_DISCOUNT)
    return score_documents_kn(docs, kn, discount=KN_DISCOUNT)


KN_LOGPROB_SQL = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens('text')} AS t FROM documents
), pr0 AS (
  SELECT doc_id, t, unnest(range(0, len(t) - 1)) AS i FROM toks
), dpairs AS (
  SELECT doc_id, t[CAST(i AS INTEGER) + 1] AS w1,
                 t[CAST(i AS INTEGER) + 2] AS w2
  FROM pr0
), big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM dpairs GROUP BY 1, 2
), marg AS (
  SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM big GROUP BY 1
), succ AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS t1 FROM big GROUP BY 1
), pred AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS t2 FROM big GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS tt FROM big
), kn AS (
  SELECT b.w1, b.w2,
         greatest(b.n12 - {KN_DISCOUNT}, 0.0) / m.n1
           + ({KN_DISCOUNT} * s.t1 / m.n1) * (p.t2 / tt) AS p_kn
  FROM big b JOIN marg m USING (w1) JOIN succ s USING (w1)
  JOIN pred p USING (w2) CROSS JOIN tot
), pair_lp AS (
  SELECT d.doc_id, ln(k.p_kn) AS lp
  FROM dpairs d JOIN kn k USING (w1, w2)
), firsts AS (
  -- LEFT join + floor: a first token never seen as any bigram's
  -- successor (single-token doc, or a pure document-starter) must
  -- still score, mirroring the operator's unseen_floor branch
  SELECT f.doc_id, ln(coalesce(p.t2 / tt, 1e-10)) AS lp
  FROM (SELECT doc_id, t[1] AS w2 FROM toks WHERE len(t) > 0) f
  LEFT JOIN pred p USING (w2) CROSS JOIN tot
), allscores AS (
  SELECT doc_id, lp FROM pair_lp UNION ALL SELECT doc_id, lp FROM firsts
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       sum(lp) AS logprob_sum, avg(lp) AS avg_logprob
FROM allscores GROUP BY doc_id
"""

QUERIES["kn_logprob_documents"] = kn_logprob_documents
ORACLE_SQL["kn_logprob_documents"] = KN_LOGPROB_SQL


def zipf_fit_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law slope of the corpus token-frequency curve
    (operators/lm.py::zipf_fit)."""
    from ..operators.lm import zipf_fit

    return zipf_fit(load_table(spark, sf_dir, "documents"))


ZIPF_SQL = f"""
WITH counts AS (
  SELECT token, CAST(count(*) AS DOUBLE) AS freq
  FROM (SELECT unnest({sql_tokens('text')}) AS token FROM documents) t
  GROUP BY 1
),
r AS (
  SELECT ln(freq) AS y,
         ln(CAST(row_number() OVER (ORDER BY freq DESC, token)
                 AS DOUBLE)) AS x
  FROM counts
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS vocab,
         CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM r
),
c AS (
  SELECT *,
    (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0) AS slope
  FROM s
)
SELECT vocab, slope, (sy - slope * sx) / n AS intercept,
  ((n * sxy - sx * sy) * (n * sxy - sx * sy))
    / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0.0) AS r2
FROM c
"""

QUERIES["zipf_fit_documents"] = zipf_fit_documents
ORACLE_SQL["zipf_fit_documents"] = ZIPF_SQL


def spectral_token_loading_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dominant PPMI eigenvector by 5 power-iteration rounds — 1-D
    spectral embedding of the vocabulary
    (operators/lm.py::spectral_token_loading)."""
    from ..operators.lm import spectral_token_loading

    return spectral_token_loading(
        load_table(spark, sf_dir, "documents"), iters=5, min_count=5
    )


def _spectral_sql(iters: int = 5) -> str:
    parts = [
        f"colloc AS MATERIALIZED ({COLLOCATIONS_SQL})",
        """m0 AS (
  SELECT w1, w2, greatest(pmi, 0.0) AS m FROM colloc
  WHERE greatest(pmi, 0.0) > 0
)""",
        """msym AS MATERIALIZED (
  SELECT u, v, sum(m) AS m FROM (
    SELECT w1 AS u, w2 AS v, m FROM m0
    UNION ALL
    SELECT w2 AS u, w1 AS v, m FROM m0
  ) t GROUP BY 1, 2
)""",
        "v0 AS MATERIALIZED (SELECT DISTINCT u AS token, 1.0 AS x FROM msym)",
    ]
    for k in range(1, iters + 1):
        parts.append(f"""mv{k} AS MATERIALIZED (
  SELECT msym.u AS token, sum(msym.m * v{k - 1}.x) AS x
  FROM msym JOIN v{k - 1} ON msym.v = v{k - 1}.token
  GROUP BY 1
)""")
        parts.append(f"""v{k} AS MATERIALIZED (
  SELECT token,
         x / nullif((SELECT sqrt(sum(x * x)) FROM mv{k}), 0.0) AS x
  FROM mv{k}
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT token, x AS loading FROM v{iters}"
    )


QUERIES["spectral_token_loading_documents"] = spectral_token_loading_documents
ORACLE_SQL["spectral_token_loading_documents"] = _spectral_sql(5)


def vocab_growth_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth at 10 doc-id milestones
    (operators/lm.py::vocab_growth)."""
    from ..operators.lm import vocab_growth

    return vocab_growth(load_table(spark, sf_dir, "documents"))


_VG_FRACS = ", ".join(repr(i / 10) for i in range(1, 10))

VOCAB_GROWTH_SQL = f"""
WITH docs AS MATERIALIZED (
  SELECT doc_id AS id, {sql_tokens('text')} AS t
  FROM documents WHERE doc_id IS NOT NULL
),
cuts AS (SELECT quantile_cont(id, [{_VG_FRACS}]) AS q FROM docs),
wb AS MATERIALIZED (
  SELECT id, t,
         len(list_filter(q, c -> c < CAST(id AS DOUBLE))) + 1
           AS milestone
  FROM docs CROSS JOIN cuts
),
tok AS (
  SELECT milestone, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(t)) AS BIGINT) AS toks
  FROM wb GROUP BY 1
),
debut AS (
  SELECT milestone, CAST(count(*) AS BIGINT) AS new_types
  FROM (
    SELECT token, min(milestone) AS milestone
    FROM (SELECT milestone, unnest(t) AS token FROM wb) x
    GROUP BY 1
  ) f GROUP BY 1
)
SELECT t.milestone, t.n_docs,
  CAST(sum(t.toks) OVER w AS BIGINT) AS cum_tokens,
  CAST(sum(coalesce(d.new_types, 0)) OVER w AS BIGINT) AS cum_types
FROM tok t LEFT JOIN debut d USING (milestone)
WINDOW w AS (ORDER BY t.milestone
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

QUERIES["vocab_growth_documents"] = vocab_growth_documents
ORACLE_SQL["vocab_growth_documents"] = VOCAB_GROWTH_SQL
