"""Noised-aggregate contracts (operators/privacy.py): reproducible
Laplace-shaped jitter on counts / clipped sums / composed means over
the events table, noise drawn from the deterministic md5-uniform
house hash. Reproducible BY DESIGN (the oracle recomputes the draw),
which is exactly why these are NOT differential-privacy releases —
see the operator module docstring."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.loaders import load_table

EPS = 1.0
CLIP = 50.0
SEED = 7

_TWO_60 = float(1 << 60)


def _sql_laplace(scale_b: str, key_expr: str) -> str:
    """DuckDB twin of operators/privacy.py::laplace_noise."""
    u = (
        f"((('0x' || substr(md5({key_expr}), 1, 15))::BIGINT + 0.5)"
        f" / {_TWO_60})"
    )
    return (
        f"(-({scale_b}) * sign({u} - 0.5)"
        f" * ln(1.0 - 2.0 * abs({u} - 0.5)))"
    )


def noised_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded noised release (ε-scale 1) of per-event-type volumes."""
    from ..operators.privacy import noised_counts

    return noised_counts(
        load_table(spark, sf_dir, "events"),
        ["event_type"],
        epsilon=EPS,
        seed=SEED,
    )


DP_COUNTS_SQL = f"""
SELECT event_type,
       CAST(count(*) AS DOUBLE)
         + {_sql_laplace(f"1.0 / {EPS}", f"'{SEED}:' || event_type")}
         AS noisy_count
FROM events GROUP BY 1
"""


def noised_event_value_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded noised release (ε-scale 1) of per-type clipped value
    totals (clip 50 = the declared sensitivity, enforced in-query)."""
    from ..operators.privacy import noised_sums

    return noised_sums(
        load_table(spark, sf_dir, "events"),
        ["event_type"],
        "value",
        epsilon=EPS,
        clip=CLIP,
        seed=SEED,
    )


DP_SUMS_SQL = f"""
SELECT event_type,
       sum(coalesce(least(greatest(CAST(value AS DOUBLE), 0.0), {CLIP}), 0.0))
         + {_sql_laplace(f"{CLIP} / {EPS}", f"'{SEED}:' || event_type")}
         AS noisy_sum
FROM events GROUP BY 1
"""


def noised_event_value_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded noised per-type means by the ε/2 + ε/2 sequential-
    composition shape over the clipped sum and the count."""
    from ..operators.privacy import noised_means

    return noised_means(
        load_table(spark, sf_dir, "events"),
        ["event_type"],
        "value",
        epsilon=EPS,
        clip=CLIP,
        seed=SEED,
    )


_S_NOISE = _sql_laplace(f"{CLIP} / ({EPS} / 2.0)", f"'{SEED}:sum:' || event_type")
_N_NOISE = _sql_laplace(f"1.0 / ({EPS} / 2.0)", f"'{SEED}:count:' || event_type")

DP_MEANS_SQL = f"""
SELECT event_type,
       (sum(coalesce(least(greatest(CAST(value AS DOUBLE), 0.0), {CLIP}), 0.0))
          + {_S_NOISE})
       / greatest(CAST(count(*) AS DOUBLE) + {_N_NOISE}, 1.0) AS noisy_mean
FROM events GROUP BY 1
"""


QUERIES = {
    "noised_event_type_counts": noised_event_type_counts,
    "noised_event_value_sums": noised_event_value_sums,
    "noised_event_value_means": noised_event_value_means,
}

ORACLE_SQL = {
    "noised_event_type_counts": DP_COUNTS_SQL,
    "noised_event_value_sums": DP_SUMS_SQL,
    "noised_event_value_means": DP_MEANS_SQL,
}
