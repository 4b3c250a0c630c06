"""Corpus-cleaning operators: benchmark decontamination, PII
detection/redaction, domain-mixture planning, and table profiling.

These are the remaining standard stages of a large-scale LLM training
pipeline (GPT-3 appendix C / PaLM §C: n-gram decontamination against
eval sets; RefinedWeb/FineWeb: PII scrubbing; The Pile / Dolma: domain
mixture weights). The reference engine has none of this surface
(SURVEY.md §2 — its only analytics is Lloyd's K-Means,
``/root/reference/master.py:27-150``); the family extends the
text-analysis operators in the same style as operators/repetition.py.

Scale doctrine shared by all four:

- decontamination shuffles (doc_id, 60-bit shingle hash) pairs, never
  text, and the eval-set side is broadcast (eval sets are ~1e5 n-grams,
  i.e. megabytes, even for large benchmark suites);
- PII scan/redact are pure per-row projections (zero shuffle, fully
  codegen'd Java regex — no Python in the path);
- mixture planning aggregates to one row per source (map-side partial
  agg), then broadcasts the single-row total — no unpartitioned window;
- profiling is a single pass over the table (one Aggregate; the exact
  variant pays Spark's Expand for multi-distinct, the approx variant is
  expand-free HLL and is the 100 TB path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.loaders import fan_out as _fan_out

from ..functions.text import bpe_ish_token_count, shingles_of, tokens
from .dedup import md5_int60

# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.1,
    train_shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Flag training documents whose n-gram shingles overlap an eval
    set (GPT-3-style decontamination, 13-grams there; n is a knob).

    ``train_shingles_df``: optionally a precomputed ``(id, sh)`` string
    shingle relation for ``train`` (same ``shingle_n``) — the shared-
    tokenization hook used by operators/pipeline.py.

    Output, one row per training document that has at least one
    shingle: ``(id, distinct_shingles, contaminated_shingles,
    contamination_frac, is_contaminated)`` where the frac is the share
    of the document's DISTINCT shingles that appear anywhere in the
    eval set, and the flag is ``frac >= threshold``.

    Scale shape: both sides reduce to 60-bit md5 shingle hashes
    (8 B keys, same doctrine as operators/dedup.py); the eval side is
    ``collect_set``-free — a DISTINCT relation explicitly marked
    ``F.broadcast``, so the probe is a map-side broadcast-hash-join
    under the training scan with zero shuffle of training data. The
    only aggregation keys on ``id`` (map-side partial combine).
    """
    if train_shingles_df is not None:
        train_sh = train_shingles_df.select(
            id_col, md5_int60(F.col("sh")).alias("h")
        ).distinct()
    else:
        train_sh = (
            _fan_out(train.select(F.col(id_col).alias(id_col), F.col(content_col)))
            .select(
                F.col(id_col).alias(id_col), tokens(content_col).alias("_t")
            )
            .select(
                id_col, F.explode(shingles_of(F.col("_t"), shingle_n)).alias("sh")
            )
            .select(id_col, md5_int60(F.col("sh")).alias("h"))
            .distinct()
        )
    eval_sh = (
        _fan_out(eval_df.select(F.col(content_col)))
        .select(tokens(content_col).alias("_t"))
        .select(F.explode(shingles_of(F.col("_t"), shingle_n)).alias("sh"))
        .select(md5_int60(F.col("sh")).alias("h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = train_sh.join(F.broadcast(eval_sh), "h", "left")
    return joined.groupBy(id_col).agg(
        F.count("*").cast("int").alias("distinct_shingles"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("int").alias(
            "contaminated_shingles"
        ),
        (
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double") / F.count("*")
        ).alias("contamination_frac"),
        (
            (
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double")
                / F.count("*")
            )
            >= F.lit(threshold)
        ).alias("is_contaminated"),
    )


class SimpleBloom:
    """Minimal portable Bloom filter over int64 keys (numpy bitset,
    double-hashing ``h_i = h1 + i*h2 mod m`` — Kirsch & Mitzenmacher
    2006 shows k derived hashes preserve the false-positive bound).
    Exists because PySpark 4 dropped ``DataFrame.stat.bloomFilter``;
    this one is picklable, so it broadcasts to Pandas-UDF workers.
    No false negatives by construction."""

    def __init__(self, items: list[int], expected_items: int, fpp: float):
        import math

        import numpy as np

        n = max(expected_items, 1)
        m = max(8, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        self.m = m
        self.k = max(1, round(m / n * math.log(2)))
        self.bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        for x in items:
            for pos in self._positions(int(x)):
                self.bits[pos >> 3] |= 1 << (pos & 7)

    def _positions(self, x: int):
        h1 = (x * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF
        h2 = ((x ^ (x >> 31)) * 0xBF58476D1CE4E5B9) & 0x7FFFFFFFFFFFFFFF | 1
        return [((h1 + i * h2) & 0x7FFFFFFFFFFFFFFF) % self.m for i in range(self.k)]

    def mightContain(self, x: int) -> bool:
        return all(
            self.bits[p >> 3] & (1 << (p & 7)) for p in self._positions(int(x))
        )


def eval_ngram_bloom(
    eval_df: DataFrame,
    *,
    content_col: str = "text",
    shingle_n: int = 3,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> SimpleBloom:
    """Driver-side Bloom filter over the eval set's shingle hashes —
    the prefilter for decontaminating corpora where even the distinct
    eval-hash relation is worth skipping for most documents.

    Intended use: ``spark.sparkContext.broadcast`` it and drop
    documents with zero candidate shingles before the exact
    broadcast-join of :func:`decontaminate`; false positives only cost
    a second look, never a wrong answer. Kept out of the exact
    operator because the join side is already broadcast — the bloom
    pays off only when the eval set is too big to broadcast as a
    relation but fits as bits (~1.2 MB per million n-grams at 1% fpp).

    Sized from the ACTUAL distinct-hash count (already in hand from
    the collect) so the requested ``fpp`` holds whatever the eval set
    turns out to be; ``expected_items`` is an optional override for
    callers that deliberately oversize (e.g. a filter reused across
    growing eval suites).
    """
    hashes = (
        _fan_out(eval_df.select(F.col(content_col)))
        .select(tokens(content_col).alias("_t"))
        .select(F.explode(shingles_of(F.col("_t"), shingle_n)).alias("sh"))
        .select(md5_int60(F.col("sh")).alias("h"))
        .distinct()
    )
    items = [r["h"] for r in hashes.collect()]
    n = expected_items if expected_items is not None else max(len(items), 1)
    return SimpleBloom(items, expected_items=n, fpp=fpp)


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.1,
    fpp: float = 0.01,
) -> DataFrame:
    """:func:`decontaminate` with the Bloom prefilter wired in — the
    regime where the eval n-gram set is too big to broadcast as a join
    relation but fits as bits.

    The broadcast bitset tags each training shingle hash MAYBE/NO in a
    vectorized Arrow pass; documents whose every shingle says NO (the
    overwhelming majority against any real benchmark suite) finalize
    immediately as zero-contamination rows WITHOUT touching the join.
    Only maybe-documents' shingles reach the exact broadcast join, so
    false positives cost a second look, never a wrong answer — output
    is row-for-row identical to :func:`decontaminate` (equivalence is
    pinned in tests).
    """
    from pyspark.sql.functions import pandas_udf

    bloom = eval_ngram_bloom(
        eval_df, content_col=content_col, shingle_n=shingle_n, fpp=fpp
    )
    b = train.sparkSession.sparkContext.broadcast(bloom)

    # no type-hint form: this module uses `from __future__ import
    # annotations`, which stringifies hints and breaks pandas_udf's
    # signature inference
    def _maybe_hit(h):
        blm = b.value
        return h.map(lambda x: bool(blm.mightContain(int(x))))

    maybe_hit = pandas_udf(_maybe_hit, "boolean")

    train_sh = (
        _fan_out(train.select(F.col(id_col).alias(id_col), F.col(content_col)))
        .select(F.col(id_col).alias(id_col), tokens(content_col).alias("_t"))
        .select(id_col, F.explode(shingles_of(F.col("_t"), shingle_n)).alias("sh"))
        .select(id_col, md5_int60(F.col("sh")).alias("h"))
        .distinct()
        .withColumn("_maybe", maybe_hit(F.col("h")))
    )
    per_doc = train_sh.groupBy(id_col).agg(
        F.count("*").cast("int").alias("distinct_shingles"),
        F.sum(F.col("_maybe").cast("int")).alias("_maybe_hits"),
    )
    clean = per_doc.where(F.col("_maybe_hits") == 0).select(
        id_col,
        "distinct_shingles",
        F.lit(0).cast("int").alias("contaminated_shingles"),
        F.lit(0.0).alias("contamination_frac"),
        F.lit(False).alias("is_contaminated"),
    )
    suspect_ids = per_doc.where(F.col("_maybe_hits") > 0).select(id_col)
    suspects_exact = decontaminate(
        train.join(suspect_ids, id_col, "left_semi"),
        eval_df,
        content_col=content_col,
        id_col=id_col,
        shingle_n=shingle_n,
        threshold=threshold,
        train_shingles_df=None,
    )
    return clean.unionByName(suspects_exact)


# --------------------------------------------------------------------------
# PII detection / redaction
# --------------------------------------------------------------------------

#: (category, pattern, replacement). Patterns are written in the common
#: subset of Java regex (Spark) and RE2 (DuckDB): character classes and
#: bounded repetition only — no lookaround, no backreferences, no \d
#: shorthand (identical in both, but [0-9] is unambiguous). Applied in
#: list order; earlier redactions can consume text later patterns would
#: otherwise match (emails before bare digit runs).
PII_RULES: list[tuple[str, str, str]] = [
    (
        "email",
        r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
        "<EMAIL>",
    ),
    (
        "phone",
        r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
        "<IP>",
    ),
    (
        "id_number",
        r"[0-9]{6,}",
        "<ID>",
    ),
]


def pii_scan(
    df: DataFrame, *, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII hit counts, one int column per rule category
    plus ``pii_total``. Pure projection: ``regexp_extract_all`` against
    the original text for every rule (scan counts are independent of
    redaction order), fully codegen'd, zero shuffle.
    """
    c = F.col(content_col)
    counts = [
        F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]
    out = df.select(F.col(id_col).alias(id_col), *counts)
    total = None
    for name, _, _ in PII_RULES:
        col = F.col(f"n_{name}")
        total = col if total is None else total + col
    return out.withColumn("pii_total", total)


def pii_redact_expr(col: "Column | str") -> Column:
    """The PII-redaction regex chain as a single zero-shuffle Column
    expression (rule order as in ``PII_RULES``) — shared by
    :func:`pii_redact` and by pipelines that attach the redacted text
    inline instead of joining it back."""
    redacted = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_RULES:
        redacted = F.regexp_replace(redacted, pat, repl)
    return redacted


def pii_redact(
    df: DataFrame, *, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact PII in rule order, returning ``(id, redacted,
    n_redacted)`` where ``n_redacted`` counts replacement tokens
    actually inserted (scanned per-stage on the progressively redacted
    text, so a digit run inside an already-redacted email is not
    double-counted). Still a single zero-shuffle projection — the
    regex chain composes inside one codegen stage.
    """
    c = F.col(content_col)
    redacted: Column = c
    n_redacted: Column = F.lit(0)
    for _, pat, repl in PII_RULES:
        n_redacted = n_redacted + F.size(
            F.regexp_extract_all(redacted, F.lit(pat), F.lit(0))
        )
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.select(
        F.col(id_col).alias(id_col),
        redacted.alias("redacted"),
        n_redacted.alias("n_redacted"),
    )


# --------------------------------------------------------------------------
# domain mixture planning
# --------------------------------------------------------------------------


def mixture_plan(
    df: DataFrame,
    *,
    source_col: str = "source",
    content_col: str = "text",
    weights: dict[str, float] | None = None,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Compute per-source sampling rates that hit a corpus token budget
    under target mixture weights (The Pile / Dolma style: "this run
    trains on X tokens, sourced A% from crawl, B% from code, ...").

    ``budget = budget_frac × total corpus tokens``; each source's
    target is ``budget × weight/Σweights``, and its keep ``rate`` is
    ``min(1, target/source_tokens)`` — a source smaller than its
    target is kept whole (rate 1.0), it is not upsampled. Unknown
    sources (absent from ``weights``) get weight 0. ``weights=None``
    means equal weights across observed sources. Degenerate inputs are
    defined, not crashes: a weights dict matching no observed source
    yields all-zero rates (empty sample); a source with zero total
    tokens gets rate 0.

    Output: one row per source — ``(source, n_docs, source_tokens,
    weight, target_tokens, rate)``.

    Scale shape: one hash aggregation to |sources| rows (map-side
    partial combine), then the Σweights/total-token scalars join back
    via a broadcast of the tiny aggregate to itself — no unpartitioned
    window, no collect. Applying the plan is a broadcast join of the
    rate table + :func:`~.sampling.hash_bucket` filter (see
    :func:`apply_mixture`).
    """
    if not 0 < budget_frac <= 1:
        raise ValueError(f"budget_frac must be in (0, 1], got {budget_frac}")
    per_source = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum(bpe_ish_token_count(content_col)).cast("long").alias("source_tokens"),
    )
    if weights is None:
        weighted = per_source.withColumn("weight", F.lit(1.0))
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in (kv[0], float(kv[1]))]
        )
        weighted = per_source.withColumn(
            "weight", F.coalesce(mapping[F.col("source")], F.lit(0.0))
        )
    totals = weighted.agg(
        F.sum("source_tokens").cast("double").alias("_total_tokens"),
        F.sum("weight").alias("_total_weight"),
    )
    planned = weighted.crossJoin(F.broadcast(totals))
    # degenerate-input guards (ANSI mode would otherwise DIVIDE_BY_ZERO
    # mid-job): a weights dict matching NO observed source -> every
    # share is 0 -> all targets/rates 0 (empty sample, documented);
    # a source whose documents have zero tokens -> rate 0 (nothing to
    # keep). CaseWhen evaluates only the taken branch, so the guarded
    # divisions never execute on the degenerate inputs.
    share = F.when(
        F.col("_total_weight") > 0, F.col("weight") / F.col("_total_weight")
    ).otherwise(F.lit(0.0))
    target = F.lit(float(budget_frac)) * F.col("_total_tokens") * share
    rate = F.when(
        F.col("source_tokens") > 0,
        F.least(F.lit(1.0), target / F.col("source_tokens")),
    ).otherwise(F.lit(0.0))
    return planned.select(
        "source",
        "n_docs",
        "source_tokens",
        "weight",
        target.alias("target_tokens"),
        rate.alias("rate"),
    )


def temperature_mixture_plan(
    df: DataFrame,
    *,
    source_col: str = "source",
    content_col: str = "text",
    alpha: float = 0.3,
    budget_frac: float = 0.5,
) -> DataFrame:
    """:func:`mixture_plan` with DATA-DERIVED weights by temperature
    scaling (Conneau et al., XLM-R 2020; T5's mixing rate): source
    weight ``= share^alpha`` where ``share`` is the source's fraction
    of corpus tokens. ``alpha=1`` reproduces the natural distribution;
    ``alpha -> 0`` flattens toward uniform, upweighting low-resource
    sources — the standard fix for dominant-crawl skew when nobody
    wants to hand-maintain a weights dict.

    Same no-upsampling policy as :func:`mixture_plan` (rates cap at
    1.0: flattening DOWNSAMPLES the head rather than repeating the
    tail) and same output shape plus a ``share`` column; feed the
    result to :func:`apply_mixture` unchanged.

    Scale shape: identical to :func:`mixture_plan` — one hash
    aggregation to |sources| rows, then two broadcast scalar joins
    (token total, then weight total — the second aggregate runs over
    the |sources|-row table, not the corpus).
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0 < budget_frac <= 1:
        raise ValueError(f"budget_frac must be in (0, 1], got {budget_frac}")
    per_source = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum(bpe_ish_token_count(content_col)).cast("long").alias("source_tokens"),
    )
    tok_total = per_source.agg(
        F.sum("source_tokens").cast("double").alias("_tt")
    )
    shared = per_source.crossJoin(F.broadcast(tok_total))
    share = F.when(
        F.col("_tt") > 0, F.col("source_tokens") / F.col("_tt")
    ).otherwise(F.lit(0.0))
    w_tab = shared.select(
        "source",
        "n_docs",
        "source_tokens",
        "_tt",
        share.alias("share"),
        F.pow(share, F.lit(float(alpha))).alias("weight"),
    )
    w_total = w_tab.agg(F.sum("weight").alias("_tw"))
    planned = w_tab.crossJoin(F.broadcast(w_total))
    # _tw == 0 only for a token-less corpus (all shares 0); guard the
    # division so the degenerate input yields zero targets, not 0/0
    target = F.when(
        F.col("_tw") > 0,
        F.lit(float(budget_frac))
        * F.col("_tt")
        * (F.col("weight") / F.col("_tw")),
    ).otherwise(F.lit(0.0))
    rate = F.when(
        F.col("source_tokens") > 0,
        F.least(F.lit(1.0), target / F.col("source_tokens")),
    ).otherwise(F.lit(0.0))
    return planned.select(
        "source",
        "n_docs",
        "source_tokens",
        "share",
        "weight",
        target.alias("target_tokens"),
        rate.alias("rate"),
    )


def apply_mixture(
    df: DataFrame,
    plan: DataFrame,
    *,
    key: str = "doc_id",
    source_col: str = "source",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Apply a :func:`mixture_plan`: keep each row iff its deterministic
    hash bucket (of ``key``, out of ``resolution``) falls under its
    source's rate. Hash bucketing (not ``rand``) keeps the sample
    retry-stable and run-reproducible — the operators/sampling.py
    doctrine. Broadcast join of the |sources|-row plan; the filter is
    a map-side projection.
    """
    from .sampling import hash_bucket

    rates = plan.select("source", "rate")
    return (
        df.join(F.broadcast(rates), df[source_col] == rates["source"], "inner")
        .drop(rates["source"])
        .where(
            hash_bucket(F.col(key), resolution)
            < (F.col("rate") * F.lit(float(resolution)))
        )
        .drop("rate")
    )


# --------------------------------------------------------------------------
# table profiling
# --------------------------------------------------------------------------


def profile_table(
    df: DataFrame, columns: list[str] | None = None, *, exact: bool = True
) -> DataFrame:
    """Column-level profile: one output row per profiled column —
    ``(col_name, n_rows, non_null, n_distinct, min_value, max_value)``
    with min/max rendered as strings so heterogeneous column types
    share one schema.

    ``exact=False`` (the 100 TB default choice): ONE pass —
    ``approx_count_distinct`` (HyperLogLog++) keeps every column's
    sketch mergeable in a single expand-free Aggregate; ±2% distinct
    counts, wide 1-row result unpivoted via ``stack`` (|columns|
    literals, not data).

    ``exact=True`` (oracle-portable): a UNION of per-column pruned
    aggregates instead of one multi-distinct Aggregate. Spark plans N
    simultaneous ``count(DISTINCT ...)``s with an Expand — ×(N+1) row
    amplification of the full-width rows before the partial agg
    (measured 7.5 s vs DuckDB's 0.05 s on 600 k rows × 6 columns).
    Per-column branches each scan exactly one column (columnar formats
    read the same total bytes as one all-column pass), each contains a
    SINGLE distinct aggregate (no Expand — Spark's two-phase distinct
    rewrite), and all branches share the scan via the union (measured
    1.5 s for the same profile — 5×; the rest is job-floor overhead).
    """
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    if not exact:
        aggs = [F.count("*").alias("_n_rows")]
        for c in cols:
            aggs += [
                F.count(F.col(c)).alias(f"_nn_{c}"),
                F.approx_count_distinct(c).alias(f"_nd_{c}"),
                F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
            ]
        wide = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{c}', _nn_{c}, _nd_{c}, _min_{c}, _max_{c}" for c in cols
        )
        return wide.select(
            F.expr(
                f"stack({len(cols)}, {stack_args}) as "
                "(col_name, non_null, n_distinct, min_value, max_value)"
            ),
            F.col("_n_rows").alias("n_rows"),
        ).select(
            "col_name", "n_rows", "non_null", "n_distinct", "min_value", "max_value"
        )

    branches = []
    for c in cols:
        branches.append(
            df.select(F.col(c)).agg(
                F.lit(c).alias("col_name"),
                F.count("*").alias("n_rows"),
                F.count(F.col(c)).alias("non_null"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_value"),
                F.max(F.col(c)).cast("string").alias("max_value"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def numeric_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Moment/quantile profile of numeric columns, one row per column:
    ``(col_name, n_rows, non_null, mean, std, p50)``. ONE aggregate
    pass (no Expand: nothing here is a distinct aggregate), unpivoted
    via ``stack`` literals. Exact percentile — switch to
    percentile_approx at scales where the per-column value buffer
    matters (same trade documented on skew_report)."""
    if not columns:
        raise ValueError("columns must be non-empty")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    aggs = [F.count("*").alias("_n")]
    for c in columns:
        col = F.col(c).cast("double")
        aggs += [
            F.count(col).alias(f"_nn_{c}"),
            F.avg(col).alias(f"_mean_{c}"),
            F.stddev_samp(col).alias(f"_std_{c}"),
            F.expr(f"percentile(CAST({c} AS DOUBLE), 0.5)").alias(f"_p50_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _mean_{c}, _std_{c}, _p50_{c}" for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) as "
            "(col_name, non_null, mean, std, p50)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("col_name", "n_rows", "non_null", "mean", "std", "p50")


def profile_drift(
    old: DataFrame, new: DataFrame, columns: list[str]
) -> DataFrame:
    """Distribution drift between two snapshots of the same table,
    one row per column:

    ``(col_name, null_rate_old, null_rate_new, null_rate_delta,
    mean_old, mean_new, mean_shift_sigmas, std_ratio, p50_old,
    p50_new)``

    ``mean_shift_sigmas`` — the mean shift in units of the OLD std —
    is the alarm metric (a |shift| > ~0.25σ on a core feature is worth
    a look long before models degrade); NULL when the old column is
    constant. The profiles are |columns|-row aggregates, so the
    comparison join is trivially broadcast; the corpus is scanned once
    per snapshot."""
    po = numeric_profile(old, columns)
    pn = numeric_profile(new, columns)
    o = po.select(
        "col_name",
        (1 - F.col("non_null") / F.col("n_rows")).alias("null_rate_old"),
        F.col("mean").alias("mean_old"),
        F.col("std").alias("std_old"),
        F.col("p50").alias("p50_old"),
    )
    n = pn.select(
        "col_name",
        (1 - F.col("non_null") / F.col("n_rows")).alias("null_rate_new"),
        F.col("mean").alias("mean_new"),
        F.col("std").alias("std_new"),
        F.col("p50").alias("p50_new"),
    )
    return o.join(n, "col_name").select(
        "col_name",
        "null_rate_old",
        "null_rate_new",
        (F.col("null_rate_new") - F.col("null_rate_old")).alias("null_rate_delta"),
        "mean_old",
        "mean_new",
        (
            (F.col("mean_new") - F.col("mean_old"))
            / F.nullif(F.col("std_old"), F.lit(0.0))
        ).alias("mean_shift_sigmas"),
        (F.col("std_new") / F.nullif(F.col("std_old"), F.lit(0.0))).alias(
            "std_ratio"
        ),
        "p50_old",
        "p50_new",
    )


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    *,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column, per-bin rows: ``(bin, n_old, n_new, p_old, p_new,
    psi_term)`` with ``sum(psi_term)`` = the PSI (rule of thumb:
    < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).

    Bin edges are the OLD snapshot's ``bins``-quantiles (the standard
    formulation: expected distribution defines the grid), collected
    to the driver as ``bins - 1`` doubles — a model-sized collect,
    same budget as kmeans centroids — and applied to both sides as
    literal comparisons (``bin = 1 + Σ (x > edge)``), so binning is a
    narrow codegen projection and each snapshot aggregates once.
    Shares of both sides are clamped at ``eps`` before the log so an
    empty bin contributes a large-but-finite term, never ±inf. NULLs
    are excluded (they are null_rate's business, see
    :func:`profile_drift`).

    The moment monitor (:func:`profile_drift`) sees mean/σ movement;
    PSI sees SHAPE movement the moments miss (variance-preserving
    bimodality, tail migration) — run both.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    qs = [i / bins for i in range(1, bins)]
    from .robust import exact_group_percentiles

    _edge_row = exact_group_percentiles(
        old.select(F.col(col).cast("double").alias("_v")),
        "_v",
        [],
        [(f"_e{i}", q) for i, q in enumerate(qs)],
    ).first()
    edges = (
        None
        if _edge_row is None or _edge_row[f"_e0"] is None
        else [_edge_row[f"_e{i}"] for i in range(len(qs))]
    )
    if edges is None:
        raise ValueError(f"old snapshot has no non-null {col} values")

    def binned(df, n_alias):
        x = F.col(col).cast("double")
        b = F.lit(1)
        for e in edges:
            b = b + F.when(x > F.lit(float(e)), 1).otherwise(0)
        return (
            df.where(x.isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias(n_alias))
        )

    # bins with zero mass on BOTH sides (possible under heavy ties)
    # still appear: seed the full bin range, left-join the counts
    spark = old.sparkSession
    grid = spark.range(1, bins + 1).select(F.col("id").cast("int").alias("bin"))
    o = binned(old, "n_old")
    n = binned(new, "n_new")
    joined = (
        grid.join(o, "bin", "left")
        .join(n, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    tot = joined.agg(
        F.sum("n_old").alias("_to"), F.sum("n_new").alias("_tn")
    )
    p_old = F.greatest(F.col("n_old") / F.col("_to"), F.lit(eps))
    p_new = F.greatest(F.col("n_new") / F.col("_tn"), F.lit(eps))
    return joined.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_old",
        "n_new",
        p_old.alias("p_old"),
        p_new.alias("p_new"),
        ((p_new - p_old) * F.log(p_new / p_old)).alias("psi_term"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 10,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: one row
    ``(k, n_groups, violating_groups, violating_rows, max_violating_n)``
    counting equivalence classes smaller than ``k`` — rows in those
    classes are re-identifiable by the quasi-identifiers alone
    (Sweeney 2002). The privacy-release twin of pii_scan: PII columns
    you redact, quasi-identifiers you aggregate or generalize until
    this report shows zero violations.

    One group-by over the quasi columns, then a |groups|-row
    aggregate; NULLs form their own class (they are still a
    distinguishable signature)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    groups = df.groupBy(*quasi_cols).agg(F.count("*").alias("_n"))
    viol = F.col("_n") < k
    return groups.agg(
        F.lit(k).alias("k"),
        F.count("*").alias("n_groups"),
        F.sum(viol.cast("long")).alias("violating_groups"),
        F.sum(F.when(viol, F.col("_n")).otherwise(0)).alias("violating_rows"),
        F.coalesce(
            F.max(F.when(viol, F.col("_n"))), F.lit(0)
        ).alias("max_violating_n"),
    )


def group_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
) -> DataFrame:
    """Per-equivalence-class diversity of a sensitive attribute:
    ``(quasi..., n, n_distinct, entropy)`` where entropy is the Shannon
    entropy (nats) of the sensitive-value distribution inside the
    class. The measurement layer under :func:`l_diversity_report`.

    Two stacked map-side-combinable aggregates (values-within-class,
    then class) — never a distinct over the raw rows."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    vals = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count("*").alias("_c")
    )
    n = F.sum("_c")
    # window-free formulation: entropy = ln(n) - (Σ c·ln c)/n
    return vals.groupBy(*quasi_cols).agg(
        n.cast("long").alias("n"),
        F.count("*").alias("n_distinct"),
        (
            F.log(n.cast("double"))
            - F.sum(F.col("_c").cast("double") * F.log(F.col("_c").cast("double")))
            / n.cast("double")
        ).alias("entropy"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    l: int = 3,
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007): a
    k-anonymous class is still disclosive if everyone in it shares the
    sensitive value — each class must contain ≥ ``l`` DISTINCT
    sensitive values. One row: ``(l, n_groups, violating_groups,
    violating_rows, min_distinct)``; the summary counts are integer-
    exact (the entropy variant lives in :func:`group_diversity` —
    thresholding entropy cross-engine invites ties at exactly ln(l),
    so the report audits the distinct criterion).

    Same two-aggregate shape as :func:`k_anonymity_report`; run both —
    k-anonymity bounds class SIZE, l-diversity bounds class CONTENT.
    """
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    groups = group_diversity(df, quasi_cols, sensitive_col)
    viol = F.col("n_distinct") < l
    return groups.agg(
        F.lit(l).alias("l"),
        F.count("*").alias("n_groups"),
        F.sum(viol.cast("long")).alias("violating_groups"),
        F.sum(F.when(viol, F.col("n")).otherwise(0)).alias("violating_rows"),
        F.min("n_distinct").alias("min_distinct"),
    )


def wasserstein_to_global(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    quantize: int | None = 4,
) -> DataFrame:
    """Earth-mover (Wasserstein-1) distance between each group's value
    distribution and the GLOBAL one — drift measured in the VALUE'S
    OWN UNITS (``W1 = ∫|F_g − F| dv``), where PSI/KL (:func:`psi_drift`)
    answer in unitless bin-mass terms and KS only reports the worst
    single gap. "Source X's prices sit $120 away from the corpus" is a
    W1 statement.

    Exact piecewise computation over the distinct-value grid: one
    (group, value) count aggregate (the corpus reduces here), the
    global counts DERIVED from it (no second scan), a
    groups×|distinct| grid via cross join, per-group cumulative
    windows (partitioned — parallel), and ``Σ |F_g − F|·Δv``.
    ``quantize`` floors values to that many decimals first
    (``floor(v·10^q)/10^q`` — floor, not round, so both engines
    quantize identically); it bounds |distinct| at scale. ``None``
    keeps raw values (exact, unbounded grid).

    Returns one row per group: ``(group, n, w1)``.
    """
    v = F.col(value_col).cast("double")
    if quantize is not None:
        if quantize < 0:
            raise ValueError(f"quantize must be >= 0, got {quantize}")
        scale = float(10**quantize)
        v = F.floor(v * F.lit(scale)) / F.lit(scale)
    from pyspark.sql.window import Window

    rows = df.where(
        v.isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("g"), v.alias("v"))
    cnt = rows.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    gval = cnt.groupBy("v").agg(F.sum("c").alias("gc"))
    ng = cnt.groupBy("g").agg(F.sum("c").alias("n"))
    tot = gval.agg(F.sum("gc").alias("nn"))
    grid = (
        ng.crossJoin(gval)
        .join(cnt, ["g", "v"], "left")
        .select(
            "g",
            "v",
            "n",
            "gc",
            F.coalesce(F.col("c"), F.lit(0.0)).alias("c"),
        )
    )
    wg = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nxt = Window.partitionBy("g").orderBy("v")
    stepped = grid.crossJoin(F.broadcast(tot)).select(
        "g",
        "n",
        F.abs(
            F.sum("c").over(wg) / F.col("n")
            - F.sum("gc").over(wg) / F.col("nn")
        ).alias("gap"),
        (F.coalesce(F.lead("v").over(nxt), F.col("v")) - F.col("v")).alias(
            "dv"
        ),
    )
    return stepped.groupBy("g").agg(
        F.first("n").cast("long").alias("n"),
        F.sum(F.col("gap") * F.col("dv")).alias("w1"),
    ).withColumnRenamed("g", group_col)


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    third rung of the release-audit ladder after
    :func:`k_anonymity_report` (class SIZE) and
    :func:`l_diversity_report` (class VARIETY): a class can be large
    and varied yet still leak if its sensitive-value DISTRIBUTION
    differs from the table's. Each equivalence class must sit within
    ``t`` of the global distribution under the ordered-attribute
    earth-mover distance

        EMD(class) = (1/(m−1)) · Σᵢ |CumPᶜˡᵃˢˢ(vᵢ) − CumPᵍˡᵒᵇᵃˡ(vᵢ)|

    over the m global ordered distinct sensitive values (unit ground
    distance between adjacent ranks — the paper's numeric form).

    One row: ``(t, n_groups, violating_groups, violating_rows,
    max_emd)``.

    Determinism note: both cumulative shares accumulate in ascending
    sensitive-value order from integer counts, so every EMD is
    bit-identical across engines and partitionings — the threshold
    comparison can never flip on float drift.

    Scale shape: one (quasi, value) count aggregate (the corpus
    reduces here), the global distribution DERIVED from it (no second
    scan), a classes×m grid, per-class cumulative windows (partitioned
    — parallel), and a |classes|-row final reduce.

    NULL policy: rows with a NULL sensitive value or NULL quasi
    attribute are EXCLUDED (stated, unlike k_anonymity_report's
    own-class policy) — a NULL-keyed class has no place in the value
    ordering the EMD cumulative walk requires, and engines disagree
    on NULL sort position. ``m`` is the global
    distinct count of the (pre-bucketed) sensitive attribute — bucket
    first, exactly as the k-anonymity contract does."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if not 0.0 < t < 1.0:
        raise ValueError(f"t must be in (0, 1), got {t}")
    from pyspark.sql.window import Window

    keep = F.col(sensitive_col).isNotNull()
    for qc in quasi_cols:
        keep = keep & F.col(qc).isNotNull()
    cnt = df.where(keep).groupBy(
        F.struct(*quasi_cols).alias("_q"),
        F.col(sensitive_col).alias("_v"),
    ).agg(F.count(F.lit(1)).cast("double").alias("_c"))
    gval = cnt.groupBy("_v").agg(F.sum("_c").alias("_gc"))
    ng = cnt.groupBy("_q").agg(F.sum("_c").alias("_n"))
    tot = gval.agg(
        F.sum("_gc").alias("_nn"),
        F.count(F.lit(1)).cast("double").alias("_m"),
    )
    grid = (
        ng.crossJoin(F.broadcast(gval))
        .join(cnt, ["_q", "_v"], "left")
        .select(
            "_q",
            "_v",
            "_n",
            "_gc",
            F.coalesce(F.col("_c"), F.lit(0.0)).alias("_c"),
        )
    )
    wq = Window.partitionBy("_q").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = grid.crossJoin(F.broadcast(tot)).select(
        "_q",
        "_n",
        "_m",
        F.abs(
            F.sum("_c").over(wq) / F.col("_n")
            - F.sum("_gc").over(wq) / F.col("_nn")
        ).alias("_gap"),
    )
    emd = stepped.groupBy("_q").agg(
        F.first("_n").alias("_n"),
        F.when(
            F.first("_m") > 1.0,
            F.sum("_gap") / (F.first("_m") - F.lit(1.0)),
        )
        .otherwise(0.0)
        .alias("_emd"),
    )
    viol = F.col("_emd") > F.lit(float(t))
    return emd.agg(
        F.lit(float(t)).alias("t"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(viol.cast("long")).alias("violating_groups"),
        F.sum(F.when(viol, F.col("_n")).otherwise(0.0))
        .cast("long")
        .alias("violating_rows"),
        F.max("_emd").alias("max_emd"),
    )


def mondrian_generalize(
    df: DataFrame,
    attrs: "list[str]",
    *,
    k: int = 10,
    depth: int = 3,
) -> DataFrame:
    """Strict multidimensional Mondrian generalization (LeFevre et
    al. 2006) — the FIXER on top of the audit ladder
    (:func:`k_anonymity_report` tells you classes are too small;
    this BUILDS k-anonymous classes): recursively split the
    2-attribute quasi-identifier space at the lower median of the
    alternating axis, refusing any cut that would leave either side
    below ``k``. Cells that cannot split pass through unchanged, so
    every leaf holds ≥ k rows by construction (given the root does).

    Output: one row per leaf — ``(cell, n, min_a1, max_a1, min_a2,
    max_a2)`` — the generalized ranges a release would publish in
    place of exact values. ``cell`` is the L/R split path, stable
    across engines because every decision is an ORDER STATISTIC
    (lower median, tie-insensitive) or an integer count; no float
    accumulates anywhere.

    Scale shape: ``depth`` rounds × two passes — a cell-partitioned
    rank window (the corpus-wide shuffle, ≤ 2^depth partitions) to
    pull each cell's median, then one conditional-count aggregate to
    gate the cut; the split metadata (≤ 2^depth rows) folds back as a
    literal CASE chain. Final pass is one grouped min/max summary.
    """
    if len(attrs) != 2:
        raise ValueError(
            f"mondrian_generalize is the explicit 2-attribute form, "
            f"got {len(attrs)}"
        )
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    a1, a2 = attrs
    rows = df.where(
        F.col(a1).isNotNull() & F.col(a2).isNotNull()
    ).select(
        F.col(a1).alias("_v1"),
        F.col(a2).alias("_v2"),
        F.lit("r").alias("_cell"),
    )
    from pyspark.sql.window import Window

    for d in range(depth):
        axis = "_v1" if d % 2 == 0 else "_v2"
        w = Window.partitionBy("_cell").orderBy(axis)
        wc = Window.partitionBy("_cell")
        ranked = rows.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_n", F.count(F.lit(1)).over(wc)
        )
        meds = ranked.where(
            F.col("_rn") == F.floor((F.col("_n") + 1) / 2)
        ).select("_cell", F.col(axis).alias("_m"), "_n")
        med_rows = {r["_cell"]: (r["_m"], r["_n"]) for r in meds.collect()}
        if not med_rows:
            break
        counts = rows.agg(
            *[
                F.sum(
                    F.when(
                        (F.col("_cell") == c)
                        & (F.col(axis) <= F.lit(m)),
                        1,
                    ).otherwise(0)
                ).alias(f"ln_{i}")
                for i, (c, (m, _n)) in enumerate(sorted(med_rows.items()))
            ]
        ).collect()[0]
        splits = {}
        for i, (c, (m, n)) in enumerate(sorted(med_rows.items())):
            left_n = counts[f"ln_{i}"]
            if left_n >= k and (n - left_n) >= k:
                splits[c] = m
        if not splits:
            continue  # this axis is stuck; the next round's axis may cut
        expr = F.col("_cell")
        for c, m in splits.items():
            expr = F.when(
                F.col("_cell") == c,
                F.concat(
                    F.col("_cell"),
                    F.when(F.col(axis) <= F.lit(m), F.lit("L")).otherwise(
                        F.lit("R")
                    ),
                ),
            ).otherwise(expr)
        rows = rows.withColumn("_cell", expr)
    return rows.groupBy(F.col("_cell").alias("cell")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_v1").alias("min_a1"),
        F.max("_v1").alias("max_a1"),
        F.min("_v2").alias("min_a2"),
        F.max("_v2").alias("max_a2"),
    )
