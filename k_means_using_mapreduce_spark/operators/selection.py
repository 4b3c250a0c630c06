"""DSIR-style data selection: hashed n-gram importance resampling.

Selecting pretraining data "close to" a small high-quality target set
is the canonical curation step the reference's pipeline never had and
a 100 TB corpus cannot skip (Xie et al., *Data Selection for Language
Models via Importance Resampling*, NeurIPS 2023 — the DSIR recipe).
The machinery here is the paper's, re-expressed as three DataFrame
passes:

1. featurize every document as a bag of HASHED n-grams (unigrams +
   bigrams of the house tokenizer, md5 -> ``buckets`` ids) — the
   feature space is a fixed ``B``-dim histogram, independent of
   vocabulary size;
2. fit smoothed categorical distributions ``p_target`` / ``p_raw``
   over the ``B`` buckets and take the per-bucket log-likelihood
   ratio (a ``B``-row table — broadcastable at any corpus size);
3. score every raw document ``log w(x) = Σ_grams log-ratio[bucket]``
   and resample with deterministic Gumbel top-k (temperature 1 =
   importance resampling without replacement; temperature → 0 =
   plain top-k by weight).

Scale shape: the only per-document work is explode(grams) →
broadcast-join the B-row ratio table → re-aggregate by doc id with
map-side combine — one shuffle of (doc_id, partial-sum) rows, never
raw text. The fitted distributions are two B-row aggregates. The
Gumbel draw is the house md5-uniform (operators/sampling.py::
hash_bucket construction), so selection is retry/repartition-stable
and exactly reproducible in the DuckDB oracle
(contracts/selection_queries.py).

Reference scope note: the reference engine (master.py:27-150) has no
data-selection surface at all; this module is part of the
training-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import shingles_of, tokens

#: 2^60 as a double — the int60 house hash normalizes to (0,1) by
#: (h + 0.5) / 2^60, so u is never exactly 0 or 1 and ln(u), ln(-ln(u))
#: are always finite.
_TWO_60 = float(1 << 60)


def gram_bucket(gram: Column, buckets: int) -> Column:
    """Hashed feature id in [0, buckets) for one n-gram: first 15 hex
    chars of md5 (= 60 bits, the house construction) mod ``buckets``."""
    h = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    return h % F.lit(buckets)


def doc_gram_buckets(text_col: Column | str, *, buckets: int) -> Column:
    """Array of hashed-gram feature ids for a document: unigrams +
    bigrams of the house tokenizer, each md5-hashed into ``buckets``.

    Multiplicity is preserved (a gram occurring c times contributes c
    array elements), so downstream sums weight by term frequency, as
    DSIR's unigram-LM parametrization requires.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens(c)
    grams = F.concat(shingles_of(toks, 1), shingles_of(toks, 2))
    return F.transform(grams, lambda g: gram_bucket(g, buckets))


def _bucket_counts(df: DataFrame, text_col: str, buckets: int) -> DataFrame:
    from ..sources.loaders import fan_out

    # the tokenize → shingle → md5 gram pipeline is the dominant
    # per-row CPU of every DSIR pass; spread the text column before it
    # (guide §2.5 — single-row-group scans otherwise run it on 1 core)
    return (
        fan_out(df.select(F.col(text_col).alias(text_col)))
        .select(F.explode(doc_gram_buckets(text_col, buckets=buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_ratio(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    *,
    buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-bucket importance log-ratio table: one row for EVERY bucket
    in [0, buckets) — ``(bucket, target_cnt, raw_cnt, log_ratio)``
    with ``log_ratio = ln(p_target) - ln(p_raw)`` under add-``alpha``
    smoothing ``p[b] = (cnt[b] + alpha) / (total + alpha * buckets)``.

    Densifying to all ``buckets`` rows (via a generated ``range``, not
    a scan) means downstream joins need no out-of-vocabulary default:
    the table IS the whole model, ``B`` rows, broadcast-sized forever.
    """
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (smoothing), got {alpha}")
    spark = target.sparkSession
    t = _bucket_counts(target, text_col, buckets)
    r = _bucket_counts(raw, text_col, buckets)
    grid = spark.range(buckets).select(F.col("id").alias("bucket"))
    dense = (
        grid.join(t.withColumnRenamed("cnt", "target_cnt"), "bucket", "left")
        .join(r.withColumnRenamed("cnt", "raw_cnt"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("target_cnt", F.lit(0)).alias("target_cnt"),
            F.coalesce("raw_cnt", F.lit(0)).alias("raw_cnt"),
        )
    )
    tot_t = F.sum("target_cnt").over(Window.partitionBy())
    tot_r = F.sum("raw_cnt").over(Window.partitionBy())
    a, ab = F.lit(float(alpha)), F.lit(float(alpha * buckets))
    return dense.select(
        "bucket",
        "target_cnt",
        "raw_cnt",
        (
            F.log((F.col("target_cnt") + a) / (tot_t + ab))
            - F.log((F.col("raw_cnt") + a) / (tot_r + ab))
        ).alias("log_ratio"),
    )


def dsir_log_weights(
    df: DataFrame,
    log_ratio: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance log-weight: ``(id_col, n_grams,
    log_weight)`` where ``log_weight = Σ_grams log_ratio[bucket(g)]``.

    ``explode_outer`` → LEFT broadcast-join the B-row ratio table →
    ONE map-side-combined aggregation by document — no doc-level
    join anywhere (an earlier draft re-joined the weights to the id
    list to keep gram-less documents, which planned as a doc×doc
    sort-merge; the outer explode keeps them for free as a
    null-bucket row, weight 0: their likelihood is 1 under both
    models).
    """
    from ..sources.loaders import fan_out

    return (
        fan_out(df.select(id_col, text_col))
        .select(
            id_col,
            F.explode_outer(
                doc_gram_buckets(text_col, buckets=_ratio_buckets(log_ratio))
            ).alias("bucket"),
        )
        .join(
            F.broadcast(log_ratio.select("bucket", "log_ratio")),
            "bucket",
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(F.sum("log_ratio"), F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_weights_fused(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """Fused DSIR: per-document importance log-weights where the
    TARGET is a predicate over ``df`` itself (the common "in-corpus
    exemplar slice" setup, e.g. ``lang == 'en'``).

    Identical math to ``dsir_log_ratio`` + ``dsir_log_weights`` — the
    contract hashes are unchanged — but the tokenize → shingle → md5
    gram pipeline runs ONCE: the exploded ``(id, is_target, bucket)``
    relation is localCheckpointed and reused for the target counts,
    the raw counts, and the per-document weight aggregation. The
    unfused composition paid that (dominant) pass three times — once
    per count side and once for the weights — ~17.8 s → ~8 s at
    sf0.1, and at 100 TB it is the difference between one corpus scan
    and three.
    """
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (smoothing), got {alpha}")
    from ..sources.loaders import fan_out

    spark = df.sparkSession
    # the shared gram pipeline (tokenize → shingle → md5) is the
    # dominant per-row CPU; spread the 3 needed columns before it
    # (guide §2.5 — no-op when the scan is already wide)
    exploded = (
        fan_out(df.select(F.col(id_col), target_pred.alias("_is_target"), F.col(text_col)))
        .select(
            F.col(id_col).alias(id_col),
            F.col("_is_target"),
            F.explode_outer(
                doc_gram_buckets(text_col, buckets=buckets)
            ).alias("bucket"),
        )
        .localCheckpoint()
    )
    grams = exploded.where(F.col("bucket").isNotNull())
    t = (
        grams.where(F.col("_is_target"))
        .groupBy("bucket")
        .agg(F.count("*").alias("target_cnt"))
    )
    r = grams.groupBy("bucket").agg(F.count("*").alias("raw_cnt"))
    grid = spark.range(buckets).select(F.col("id").alias("bucket"))
    dense = (
        grid.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("target_cnt", F.lit(0)).alias("target_cnt"),
            F.coalesce("raw_cnt", F.lit(0)).alias("raw_cnt"),
        )
    )
    tot_t = F.sum("target_cnt").over(Window.partitionBy())
    tot_r = F.sum("raw_cnt").over(Window.partitionBy())
    a, ab = F.lit(float(alpha)), F.lit(float(alpha * buckets))
    ratio = dense.select(
        "bucket",
        (
            F.log((F.col("target_cnt") + a) / (tot_t + ab))
            - F.log((F.col("raw_cnt") + a) / (tot_r + ab))
        ).alias("log_ratio"),
    )
    return (
        exploded.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(F.sum("log_ratio"), F.lit(0.0)).alias("log_weight"),
        )
    )


def _ratio_buckets(log_ratio: DataFrame) -> int:
    """The ratio table is dense on [0, B), so B = its row count. A
    count() on a B-row aggregate is a driver no-op at any scale."""
    n = log_ratio.count()
    if n < 2:
        raise ValueError(f"log_ratio table must have >= 2 rows, got {n}")
    return n


def gumbel_key(
    log_weight: Column, id_col: Column, *, seed: int, temperature: float
) -> Column:
    """Gumbel-max resampling key ``log_weight / T + G`` with the Gumbel
    noise ``G = -ln(-ln(u))`` drawn from the DETERMINISTIC md5 uniform
    ``u = (int60(md5(seed ~ ':' ~ id)) + 0.5) / 2^60`` — taking the
    top-k by this key is exactly sampling k items without replacement
    with probability ∝ exp(log_weight / T) (the Gumbel-top-k trick),
    yet every run, retry and engine (incl. the DuckDB oracle) draws the
    identical sample."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), id_col.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_TWO_60)
    return log_weight / F.lit(float(temperature)) - F.log(-F.log(u))


def dsir_resample(
    weighted: DataFrame,
    *,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    temperature: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Select ``k`` documents by Gumbel top-k over the importance
    weights: adds ``resample_key`` and keeps the k largest. One global
    rank — computed as window row_number over a single ordered
    partition of the (id, key) PROJECTION, never the documents
    themselves; at 100 TB pre-filter with a per-partition top-k
    (``F.max`` heap via limit) before the global sort if k is large.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    key = gumbel_key(
        F.col(weight_col), F.col(id_col), seed=seed, temperature=temperature
    )
    scored = weighted.withColumn("resample_key", key)
    w = Window.orderBy(F.desc("resample_key"), id_col)
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def source_ablation(
    df: DataFrame,
    group_col: str,
    metric: Column,
    *,
    metric_name: str = "metric",
) -> DataFrame:
    """Leave-one-source-out data valuation on a mean metric: for every
    source, the corpus mean WITHOUT it vs with it — "which source is
    dragging the mix down" answered in closed form from one scan
    (per-source sums + the global totals they imply), no per-source
    re-aggregation. The cheap first pass before per-source DSIR
    weights or mixture re-planning.

    ``delta = mean(rest) − mean(all)``: positive means REMOVING the
    source would raise the metric (the source hurts the mix). A
    single-source corpus reports NULL delta (no "rest" exists). NULL
    metric rows are excluded from both sides.

    Returns ``(group, n, mean_in, mean_rest, delta)`` one row per
    source, plus the implied global mean on every row for context.
    """
    g = F.col(group_col)
    m = metric.cast("double")
    rows = df.where(g.isNotNull() & m.isNotNull())
    per = rows.groupBy(g.alias("grp")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(m).alias("s"),
    )
    tot = per.agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts")
    )
    j = per.crossJoin(F.broadcast(tot))
    rest_n = F.col("tn") - F.col("n")
    rest_mean = (F.col("ts") - F.col("s")) / F.nullif(rest_n, F.lit(0.0))
    return j.select(
        F.col("grp").alias(group_col),
        F.col("n").cast("long").alias("n"),
        (F.col("s") / F.col("n")).alias(f"{metric_name}_in"),
        rest_mean.alias(f"{metric_name}_rest"),
        (rest_mean - F.col("ts") / F.col("tn")).alias("delta"),
        (F.col("ts") / F.col("tn")).alias(f"{metric_name}_global"),
    )
