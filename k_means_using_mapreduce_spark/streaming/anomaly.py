"""Streaming anomaly scoring against a batch-computed baseline.

The production split of operators/timeseries.py::anomaly_flags: the
baseline (per-key mean/std of bucket counts) is computed BATCH-side
over history — it changes slowly and wants the full window math — and
the live stream only aggregates its own buckets and compares. The
stream side therefore carries no long history in state: watermarked
tumbling-window counts (state = in-flight windows only) plus a
stream-static broadcast join against the tiny baseline table.

This is the standard lambda-ish deployment shape for detectors on
Spark: retrain/refresh the baseline on a schedule, leave the 24/7
stream query untouched (the static side is re-read per micro-batch
when the baseline is a table/file source, so refreshes flow in
without restarting the query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def baseline_from_series(
    series: DataFrame, *, key_col: str = "key", value_col: str = "n"
) -> DataFrame:
    """Per-key (mean, std) over a historical gap-filled series
    (operators/timeseries.py::resample_counts output). |keys| rows —
    broadcastable by construction."""
    return series.groupBy(F.col(key_col).alias("key")).agg(
        F.avg(F.col(value_col).cast("double")).alias("mean_base"),
        F.stddev_samp(F.col(value_col).cast("double")).alias("std_base"),
    )


def score_stream(
    events: DataFrame,
    baseline: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    z: float = 3.0,
) -> DataFrame:
    """Windowed stream counts scored against the batch baseline.

    Emits one FINALIZED row per (key, window) once the watermark passes
    (append semantics — a window scores exactly once):
    ``(key, window_start, window_end, n, zscore, is_anomaly)``. Keys
    unseen in the baseline emit NULL zscore / false flag rather than
    dropping (left join): silence about a brand-new key is worse than
    an unscored count.
    """
    if z <= 0:
        raise ValueError(f"z must be positive, got {z}")
    counts = (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col).alias("key"), F.window(F.col(ts_col), window)
        )
        .agg(F.count("*").alias("n"))
    )
    scored = counts.join(F.broadcast(baseline), "key", "left").withColumn(
        "zscore",
        F.when(
            F.col("std_base").isNotNull() & (F.col("std_base") > 0.0),
            (F.col("n").cast("double") - F.col("mean_base"))
            / F.col("std_base"),
        ),
    )
    return scored.select(
        "key",
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n",
        "zscore",
        F.coalesce(F.abs(F.col("zscore")) > z, F.lit(False)).alias(
            "is_anomaly"
        ),
    )
