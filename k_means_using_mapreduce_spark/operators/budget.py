"""Token-budget allocation across sources: greedy water-filling under
per-source epoch caps — the planning step of a data-mixing pipeline
("we can afford B tokens; how many do we take from each source, given
we refuse to repeat any source more than E epochs?").

The policy is the standard greedy: rank sources by a preference score
(quality, typically), walk down the ranking giving each source up to
``capacity = tokens × max_epochs`` until the budget is exhausted. That
is a prefix-sum program, not a loop: with sources ordered by
(score desc, source), ``alloc = clamp(B − cum_before, 0, capacity)``
where ``cum_before`` is the running capacity sum of all
better-ranked sources.

Scale shape: the input is PER-SOURCE stats (G rows — produced upstream
by a corpus-sized groupBy that map-side combines), so the single-task
global window here touches G rows, never documents. The allocation
plan is then broadcast back onto the corpus by whatever sampler
executes it (operators/sampling.py::hash_sample per source with
rate = alloc/tokens for the sub-epoch tail).

Determinism doctrine: ordering ties break on the source name, so the
same stats always yield the same plan.

Reference scope: extension surface; the reference engine
(master.py:27-150) has no planning operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F


def allocate_budget(
    stats: DataFrame,
    *,
    total_budget: float,
    max_epochs: float = 1.0,
    tokens_col: str = "tokens",
    score_col: str = "quality",
    source_col: str = "source",
) -> DataFrame:
    """Per-source allocation plan: ``(source, tokens, score, capacity,
    cum_before, alloc, epochs, exhausted)``.

    ``alloc`` is in tokens (double — fractional epochs are real:
    alloc/tokens of a source is executed as a deterministic hash-sample
    rate). ``epochs = alloc / tokens`` (0 for an empty source).
    ``exhausted`` marks sources the budget ran out before (alloc=0 or
    partial).
    """
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    toks = F.col(tokens_col).cast("double")
    cap = toks * F.lit(float(max_epochs))
    w = (
        Window.orderBy(F.col(score_col).desc(), F.col(source_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(float(total_budget))
    with_cum = stats.select(
        F.col(source_col).alias("source"),
        toks.alias("tokens"),
        F.col(score_col).cast("double").alias("score"),
        cap.alias("capacity"),
        (F.sum(cap).over(w) - cap).alias("cum_before"),
    )
    alloc = F.greatest(
        F.lit(0.0),
        F.least(F.col("capacity"), budget - F.col("cum_before")),
    )
    return with_cum.select(
        "*",
        alloc.alias("alloc"),
        F.when(F.col("tokens") > 0, alloc / F.col("tokens"))
        .otherwise(F.lit(0.0))
        .alias("epochs"),
        (alloc < F.col("capacity")).alias("exhausted"),
    )


def ipf_rake_weights(
    df: DataFrame,
    row_col: str,
    col_col: str,
    *,
    row_targets: dict,
    col_targets: dict,
    iters: int = 5,
) -> DataFrame:
    """Iterative proportional fitting (raking) of cell weights so the
    weighted corpus matches TARGET marginals on two axes at once —
    "make the mix 40/40/20 by source AND uniform by language" with one
    weight per (source, language) cell, the survey-statistics answer
    to two-axis mixture planning (single-axis planning is
    :func:`source_budget_plan`'s job).

    Classic IPF: starting from w = 1, alternately scale each row's
    weights to hit its target share, then each column's (``iters``
    full sweeps; IPF converges geometrically when all cells are
    non-empty, and the FIXED sweep count keeps the whole thing an
    unrollable deterministic plan — the kmeans_fit doctrine). All
    arithmetic lives on the tiny |rows|×|cols| cell relation;
    the corpus is scanned once for the counts.

    Targets are PROPORTIONS over the listed keys (each dict must sum
    to ~1); keys absent from the data are ignored with their mass
    renormalized implicitly by the next sweep, cells absent from the
    data stay absent (structural zeros, the standard convention).
    Returns ``(row, col, n, weight)`` where ``Σ n·w = Σ n`` and the
    weighted marginals approach the targets.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    for name, t in (("row_targets", row_targets), ("col_targets", col_targets)):
        tot = sum(t.values())
        if not 0.999 <= tot <= 1.001:
            raise ValueError(f"{name} must sum to 1, got {tot}")
    spark = df.sparkSession
    r, c = F.col(row_col), F.col(col_col)
    cells = (
        df.where(r.isNotNull() & c.isNotNull())
        .where(r.isin(list(row_targets)) & c.isin(list(col_targets)))
        .groupBy(r.alias("_r"), c.alias("_c"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    rt = F.broadcast(
        _k_row_df(spark, 
            [(k, float(v)) for k, v in row_targets.items()], "_r string, _rt double"
        )
    )
    ct = F.broadcast(
        _k_row_df(spark, 
            [(k, float(v)) for k, v in col_targets.items()], "_c string, _ct double"
        )
    )
    w = cells.join(rt, "_r").join(ct, "_c").withColumn("w", F.lit(1.0))
    total = F.sum(F.col("n") * F.col("w"))
    from pyspark.sql.window import Window

    for _ in range(iters):
        wr = Window.partitionBy("_r")
        wall = Window.partitionBy()
        w = w.withColumn(
            "w",
            F.col("w")
            * (F.col("_rt") * F.sum(F.col("n") * F.col("w")).over(wall))
            / F.sum(F.col("n") * F.col("w")).over(wr),
        )
        wc = Window.partitionBy("_c")
        w = w.withColumn(
            "w",
            F.col("w")
            * (F.col("_ct") * F.sum(F.col("n") * F.col("w")).over(wall))
            / F.sum(F.col("n") * F.col("w")).over(wc),
        )
    return w.select(
        F.col("_r").alias(row_col),
        F.col("_c").alias(col_col),
        F.col("n").cast("long").alias("n"),
        F.col("w").alias("weight"),
    )
