"""Survival analysis: the Kaplan-Meier estimator over right-censored
durations — retention/churn curves computed correctly.

Naive retention ("fraction of users still active after T") silently
treats users who joined recently as churned; Kaplan-Meier (1958) is
the standard fix — censored subjects leave the risk set without
counting as events, so the curve is unbiased under independent
censoring.

Estimator: with d_t events among n_t at risk at each distinct event
time t, ``S(t) = Π_{t' ≤ t} (1 − d_{t'}/n_{t'})``.

Spark shape: durations reduce to one row per DISTINCT duration (a
map-side-combinable count), so every window below runs over the
distinct-duration table — thousands of rows no matter how many
subjects — in ONE ordered pass: the risk set is a reverse cumulative
sum, and the product is ``exp(cumsum(ln))`` with an explicit
zero-factor guard (a time where everyone at risk dies sends the curve
to exactly 0; ln(0) is null in Spark and -inf in other engines, so
the guard keeps both the math and the oracle well-defined). The
window is globally ordered — a single-reducer pass over the
distinct-duration table, which is fine because that table is
tiny; at extreme cardinality pre-bucket durations first.

The reference has no temporal surface (SURVEY.md §2); this joins the
retention/funnel family (operators/timeseries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Survival curve from ``(duration, event)`` rows (event 1 =
    observed, 0 = right-censored). Output: one row per distinct
    OBSERVED-event duration — ``(t, n_risk, n_events, survival)``,
    ascending t."""
    per_t = (
        df.groupBy(F.col(duration_col).alias("t"))
        .agg(
            F.count("*").alias("_all"),
            F.sum(F.col(event_col).cast("long")).alias("n_events"),
        )
    )
    w_desc = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    with_risk = per_t.withColumn("n_risk", F.sum("_all").over(w_desc))
    d = F.col("n_events").cast("double")
    n = F.col("n_risk").cast("double")
    factor = F.lit(1.0) - d / n
    curve = (
        with_risk.withColumn("_f", factor)
        .withColumn(
            "_lnf", F.when(F.col("_f") > 0, F.log("_f")).otherwise(F.lit(0.0))
        )
        .withColumn("_runmin", F.min("_f").over(w_asc))
        .withColumn(
            "survival",
            F.when(
                F.col("_runmin") > 0, F.exp(F.sum("_lnf").over(w_asc))
            ).otherwise(F.lit(0.0)),
        )
    )
    return (
        curve.where(F.col("n_events") > 0)
        .select("t", "n_risk", "n_events", "survival")
    )


def user_lifetimes(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    horizon_ns: int,
    unit_ns: int,
) -> DataFrame:
    """Per-user (duration, event) pairs from an event log: duration =
    first-to-last activity span in ``unit_ns`` units (integer floor
    division — exact on int64 nanos), event = 1 (churn observed) iff
    the user's last activity precedes the corpus end by more than
    ``horizon_ns``, else censored-at-present 0. The global end arrives
    by broadcast, not collect."""
    if horizon_ns < 0:
        raise ValueError(f"horizon_ns must be >= 0, got {horizon_ns}")
    if unit_ns <= 0:
        raise ValueError(f"unit_ns must be > 0, got {unit_ns}")
    spans = events.groupBy(user_col).agg(
        F.min(ts_col).alias("_first"), F.max(ts_col).alias("_last")
    )
    glob = spans.agg(F.max("_last").alias("_gmax"))
    span = F.col("_last") - F.col("_first")
    return (
        spans.join(F.broadcast(glob))
        .select(
            user_col,
            ((span - span % unit_ns) / unit_ns).cast("long").alias("duration"),
            (F.col("_last") < F.col("_gmax") - F.lit(horizon_ns))
            .cast("int")
            .alias("event"),
        )
    )


def log_rank_test(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
    *,
    group_a,
    group_b,
) -> DataFrame:
    """Two-group log-rank test (Mantel 1966) — "are these two
    survival curves the same?", the inferential companion to
    :func:`kaplan_meier`: one row ``(n_a, n_b, events_a, events_b,
    o_minus_e, var, chi2, z)`` where at every distinct event time
    ``E_a = d · n_a/n`` and ``V = d (n_a/n)(1 − n_a/n)(n − d)/(n − 1)``
    over the at-risk sets, ``chi2 = (Σ(d_a − E_a))² / ΣV`` (1 dof).

    Same scale shape as the estimator: everything reduces to the
    distinct-duration table first (per-time event/at-risk counts per
    group via one aggregation + reverse cumulative windows), so the
    ordered pass sees time cardinality, not subjects. Single-time
    risk sets of 1 contribute zero variance (the n > 1 guard).
    """
    g = F.col(group_col)
    ev = F.col(event_col).cast("int")
    both = df.where(g.isin([group_a, group_b]))
    per_t = (
        both.groupBy(F.col(duration_col).alias("t"))
        .agg(
            F.sum(F.when(g == group_a, ev).otherwise(0)).alias("d1"),
            F.sum(F.when(g == group_b, ev).otherwise(0)).alias("d2"),
            F.sum(F.when(g == group_a, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(g == group_b, 1).otherwise(0)).alias("c2"),
        )
    )
    w = (
        Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    risky = per_t.select(
        "t",
        "d1",
        "d2",
        F.sum("c1").over(w).cast("double").alias("n1"),
        F.sum("c2").over(w).cast("double").alias("n2"),
    ).where(F.col("d1") + F.col("d2") > 0)
    d = (F.col("d1") + F.col("d2")).cast("double")
    n = F.col("n1") + F.col("n2")
    e1 = d * F.col("n1") / n
    v = F.coalesce(
        d
        * (F.col("n1") / n)
        * (1 - F.col("n1") / n)
        * (n - d)
        / F.nullif(n - 1, F.lit(0.0)),
        F.lit(0.0),
    )
    terms = risky.agg(
        # coalesce: a zero-event input (everyone censored) yields a
        # well-defined 0-evidence row, not NULLs (which the DuckDB
        # pandas bridge would render NaN); chi2/z stay NULL there —
        # "no evidence" has no statistic
        F.coalesce(F.sum(F.col("d1") - e1), F.lit(0.0)).alias("o_minus_e"),
        F.coalesce(F.sum(v), F.lit(0.0)).alias("var"),
        F.coalesce(F.sum("d1"), F.lit(0)).cast("long").alias("events_a"),
        F.coalesce(F.sum("d2"), F.lit(0)).cast("long").alias("events_b"),
    )
    sizes = both.agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(g == group_b, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    return sizes.crossJoin(F.broadcast(terms)).select(
        "n_a",
        "n_b",
        "events_a",
        "events_b",
        "o_minus_e",
        "var",
        (
            F.col("o_minus_e") * F.col("o_minus_e")
            / F.nullif(F.col("var"), F.lit(0.0))
        ).alias("chi2"),
        (F.col("o_minus_e") / F.sqrt(F.nullif(F.col("var"), F.lit(0.0)))).alias(
            "z"
        ),
    )
