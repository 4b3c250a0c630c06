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
