"""Streaming sequential A/B monitoring (Wald SPRT).

The streaming twin of operators/hypothesis.py::ab_proportion_test:
a fixed-horizon z-test answers "was arm B better over this window?",
while an experiment that STREAMS needs an answer the moment evidence
suffices — peeking at a z-test inflates false positives, Wald's
sequential probability ratio test (Wald 1945) is the peek-safe
design: per arm, accumulate (trials, successes) and stop the first
time the Bernoulli log-likelihood ratio for H1: p = p1 against
H0: p = p0 crosses the (alpha, beta)-derived thresholds

    accept_h1 at llr >= ln((1 - beta) / alpha)
    accept_h0 at llr <= ln(beta / (1 - alpha))

State is two longs per arm — volume-independent, exactly the shape
of the other maintenance sinks (moments/HLL/count-min). The merge is
ACCUMULATING (addition), so the base sink's replay guard is
load-bearing for exactly-once, as for those sinks.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import ParquetUpsertSink


class SprtSink(ParquetUpsertSink):
    """foreachBatch handler accumulating per-arm Bernoulli evidence;
    ``decision()`` returns the live SPRT verdict per arm."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        arm_col: str,
        success_col: str,
        *,
        p0: float,
        p1: float,
        alpha: float = 0.05,
        beta: float = 0.2,
    ):
        if not 0 < p0 < 1 or not 0 < p1 < 1 or p0 == p1:
            raise ValueError(f"need distinct p0, p1 in (0,1), got {p0}, {p1}")
        if not 0 < alpha < 1 or not 0 < beta < 1:
            raise ValueError(f"alpha/beta must be in (0,1), got {alpha}, {beta}")
        super().__init__(spark, path, [arm_col])
        self.arm_col = arm_col
        self.success_col = success_col
        self.p0, self.p1 = float(p0), float(p1)
        self.alpha, self.beta = float(alpha), float(beta)

    def _merge(self, prev: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        b = batch_df.groupBy(self.arm_col).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col(self.success_col).cast("int")).cast("long").alias("x"),
        )
        if prev is None:
            return b
        return (
            prev.unionByName(b)
            .groupBy(self.arm_col)
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("x").cast("long").alias("x"),
            )
        )

    def decision(self) -> DataFrame:
        """Per-arm ``(arm, n, x, rate, llr, verdict)`` — verdict is
        'accept_h1' (rate is p1-like), 'accept_h0', or 'continue'.
        Derived entirely from the two-long state, so the read is
        arm-count-sized."""
        cur = self.current()
        if cur is None:
            raise ValueError("no batches committed yet")
        lw = math.log(self.p1 / self.p0)
        ll = math.log((1 - self.p1) / (1 - self.p0))
        hi = math.log((1 - self.beta) / self.alpha)
        lo = math.log(self.beta / (1 - self.alpha))
        llr = F.col("x") * F.lit(lw) + (F.col("n") - F.col("x")) * F.lit(ll)
        return cur.select(
            self.arm_col,
            "n",
            "x",
            (F.col("x") / F.col("n")).alias("rate"),
            llr.alias("llr"),
            F.when(llr >= hi, F.lit("accept_h1"))
            .when(llr <= lo, F.lit("accept_h0"))
            .otherwise(F.lit("continue"))
            .alias("verdict"),
        )
