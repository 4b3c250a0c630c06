"""Time-series subsequence similarity search (pattern matching).

"Find every window that looks like THIS shape" — the UCR-suite /
Matrix-Profile query shape (z-normalized euclidean distance over
sliding windows), done Spark-first: windows come from ONE
frame-bounded ``collect_list`` over the per-key time order (a single
exchange on the series key — the sessionize shuffle), z-normalization
and the distance fold are array expressions (JVM, no UDF), and the
ranking reuses the engine's two-phase top-k doctrine. Z-normalizing
both window and pattern makes the match amplitude- and
offset-invariant — "a spike is a spike" whether it is 10 events or
10,000.

Scale shape: each row carries an L-length window (L ≈ tens), so the
widened relation is |series| × L doubles — linear, never quadratic;
constant windows (σ = 0) are dropped before any distance math (their
shape is undefined). At 100 TB the per-key series live in their own
partitions and the global top-k reduces per-partition survivors.

Determinism: distances are ranked on ``round(dist, 8)`` with
(key, start) tie-breaks (the tfidf_top_terms doctrine), so the top-k
boundary cannot flip on float jitter between engines; the oracle
(contracts/tsmatch_queries.py) replays the identical fold order via
``list_reduce``.

Reference scope note: the reference engine (master.py:27-150) has no
time-series surface; extension scope per the build brief.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def znormalize_pattern(pattern: Sequence[float]) -> list[float]:
    """Driver-side z-normalization of the (short) query pattern —
    same population-σ convention as the window expression."""
    vals = [float(v) for v in pattern]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / n
    if var <= 0:
        raise ValueError("pattern is constant — shape is undefined")
    std = var ** 0.5
    return [(v - mean) / std for v in vals]


def sliding_windows(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    *,
    length: int,
) -> DataFrame:
    """Per-key sliding windows: ``(key_col, start, window
    array<double>)`` — one frame-bounded collect over the key-time
    order; partial trailing windows are dropped (len < length)."""
    if length < 2:
        raise ValueError(f"length must be >= 2, got {length}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, length - 1)
    )
    return (
        df.select(
            key_col,
            F.col(order_col).alias("start"),
            F.collect_list(F.col(value_col).cast("double"))
            .over(w)
            .alias("window"),
        )
        .where(F.size("window") == length)
    )


def _zwindows(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    length: int,
) -> DataFrame:
    """Z-normalized windows ``(key_col, start, z array<double>)`` —
    shared by query matching and motif mining; constant windows
    (σ = 0) are dropped here, once."""
    L = F.lit(float(length))
    wins = sliding_windows(df, key_col, order_col, value_col, length=length)
    mean = F.aggregate(F.col("window"), F.lit(0.0), lambda a, x: a + x) / L
    staged = wins.withColumn("_mean", mean)
    var = (
        F.aggregate(
            F.col("window"),
            F.lit(0.0),
            lambda a, x: a + (x - F.col("_mean")) * (x - F.col("_mean")),
        )
        / L
    )
    staged = staged.withColumn("_std", F.sqrt(var)).where(F.col("_std") > 0)
    return staged.select(
        key_col,
        "start",
        F.transform(
            F.col("window"), lambda x: (x - F.col("_mean")) / F.col("_std")
        ).alias("z"),
    )


def subsequence_topk(
    df: DataFrame,
    pattern: Sequence[float],
    key_col: str,
    order_col: str,
    value_col: str,
    *,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` windows most similar to ``pattern`` under
    z-normalized euclidean distance: ``(key_col, start, dist, rk)``.

    The window length is the pattern length; both sides are
    z-normalized (population σ), so only SHAPE matters. Constant
    windows are excluded — their z-shape is undefined.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    zp = znormalize_pattern(pattern)
    length = len(zp)
    staged = _zwindows(df, key_col, order_col, value_col, length)
    z = F.col("z")
    diff2 = F.zip_with(
        z,
        F.array(*[F.lit(p) for p in zp]),
        lambda a, b: (a - b) * (a - b),
    )
    dist = F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda a, x: a + x))
    scored = staged.select(
        key_col, "start", F.round(dist, 8).alias("dist")
    )
    w = Window.orderBy(F.asc("dist"), key_col, "start")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )


def motif_pairs(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    *,
    length: int,
    k: int = 5,
    min_separation: int = 0,
    max_bucket: int = 200,
) -> DataFrame:
    """Motif discovery: the ``k`` most similar non-trivial window
    PAIRS (the recurring shapes of the series) — ``(key_a, start_a,
    key_b, start_b, dist, rk)``.

    Sign-LSH candidate generation: windows sharing the SIGN PATTERN
    of their z-shape (one bit per position) land in one bucket, and
    only within-bucket pairs are scored — per-bucket quadratic, the
    engine's banding doctrine (operators/dedup.py, operators/
    rplsh.py), with ``max_bucket`` dropping degenerate buckets
    before the self-join. Same-key pairs closer than
    ``min_separation`` (in ``order_col`` units) are excluded — the
    trivial-match rule: a window nearly always matches its own
    1-step shift. Approximate by construction (a true motif pair
    crossing a sign boundary is missed — the standard sign-LSH
    trade); the CANDIDATE SET is deterministic, so results are
    exactly reproducible and oracle-checkable.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_bucket < 2:
        raise ValueError(f"max_bucket must be >= 2, got {max_bucket}")
    zw = _zwindows(df, key_col, order_col, value_col, length).withColumn(
        "bucket",
        F.concat_ws(
            "",
            *[
                F.when(F.col("z")[i] > 0, F.lit("1")).otherwise(F.lit("0"))
                for i in range(length)
            ],
        ),
    )
    sizes = zw.groupBy("bucket").agg(F.count("*").alias("_bn"))
    zw = zw.join(
        F.broadcast(sizes.where(F.col("_bn") <= max_bucket).select("bucket")),
        "bucket",
    )
    a = zw.select(
        "bucket",
        F.col(key_col).alias("key_a"),
        F.col("start").alias("start_a"),
        F.col("z").alias("_za"),
    )
    b = zw.select(
        "bucket",
        F.col(key_col).alias("key_b"),
        F.col("start").alias("start_b"),
        F.col("z").alias("_zb"),
    )
    pairs = a.join(b, "bucket").where(
        (F.col("key_a") < F.col("key_b"))
        | (
            (F.col("key_a") == F.col("key_b"))
            & (F.col("start_a") < F.col("start_b"))
        )
    )
    if min_separation > 0:
        pairs = pairs.where(
            (F.col("key_a") != F.col("key_b"))
            | (
                F.col("start_b") - F.col("start_a")
                >= F.lit(min_separation)
            )
        )
    diff2 = F.zip_with(
        F.col("_za"), F.col("_zb"), lambda x, y: (x - y) * (x - y)
    )
    dist = F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x))
    scored = pairs.select(
        "key_a",
        "start_a",
        "key_b",
        "start_b",
        F.round(dist, 8).alias("dist"),
    )
    w = Window.orderBy(
        F.asc("dist"), "key_a", "start_a", "key_b", "start_b"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )
