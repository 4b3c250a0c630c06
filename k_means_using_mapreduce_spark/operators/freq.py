"""Mergeable count-min frequency sketches (Cormode-Muthukrishnan 2005).

The frequency twin of operators/sketch.py: exact per-value counts over
100 TB of tokens produce a result as large as the vocabulary itself
(billions of rows), and a per-day exact top-k can never be merged into
a weekly one (a value just below every daily cutoff can be the global
winner). The count-min sketch bounds the pre-aggregate at
``depth x width`` counters per bucket — KBs, independent of
cardinality — while guaranteeing, deterministically, that every
estimate is an OVERCOUNT: ``true <= est``, and
``est <= true + N * e / width`` with probability ``1 - e^-depth``
over the hash draw.

Representation: SPARSE rows ``(group..., d, bucket, cnt)`` instead of
a dense ``array<array<long>>`` binary. Sparse rows make the sketch a
plain DataFrame — built by one map-side-combined aggregation, merged
to any coarser grouping by ``SUM`` (counter matrices add elementwise),
probed with a broadcast join — with no custom UDAF and no binary
format. Untouched counters are implicitly zero; the row count per
group is ``min(depth x width, depth x distinct-values)``.

Determinism: the d row hashes are the engine's md5 affine family
(``md5(d || ':' || value)`` first-15-hex-chars -> int60 -> mod width),
the same construction as operators/sampling.py::hash_bucket — so the
sketch is retry/repartition-stable, identical run-to-run, and exactly
reproducible in DuckDB, which makes both the sketch table AND the
estimates oracle-checkable (unlike the library-binary HLL/KLL/theta
sketches, which are pinned by property tests instead).

Scale shape:

- ``build_freq_sketch`` — one pass; the explode-by-depth factor (x
  ``depth``, typically 3-4) happens map-side and partial-aggregates
  to at most ``depth x width`` rows per group before the shuffle.
- ``rollup_freq`` / the streaming merge sink — operate on sketch rows
  only; raw events are never re-read.
- ``estimate_counts`` — broadcast-joins the (tiny) probe set against
  the sketch; per probe the answer is ``min`` over ``depth`` matched
  counters, absent counters counting as 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 3
DEFAULT_WIDTH = 1024


def _check_shape(depth: int, width: int) -> None:
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")


def cm_bucket(value: Column | str, d: Column | int, width: int) -> Column:
    """Row ``d``'s counter index for ``value``: md5 of ``d || ':' ||
    value`` (first 15 hex chars = 60 bits) mod ``width``. The ':'
    separator keeps ``(d=1, value='2x')`` and ``(d=12, value='x')``
    from colliding by construction."""
    v = F.col(value) if isinstance(value, str) else value
    dc = F.lit(d) if isinstance(d, int) else d
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", dc.cast("string"), v.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h % F.lit(width)


def value_counts(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group value histogram ``(group..., _v, cnt)`` — the
    intermediate both the sketch builder and the exact-count side of
    a probe share. NULL values are skipped (like count(col))."""
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, F.col(value_col).alias("_v"))
        .agg(F.count("*").alias("cnt"))
    )


def build_freq_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Per-group count-min sketch of ``value_col`` occurrences as
    sparse ``(group..., d, bucket, cnt)`` rows. ``group_cols=[]``
    builds the single global sketch.

    Histogram-first: occurrences first collapse to a per-group value
    histogram (partial-combined value shuffle), and the depth explode
    + md5 hashing run over VOCABULARY rows weighted by their counts —
    at corpus scale that is ``depth`` hashes per distinct value, not
    per occurrence (Heap's law makes vocab ≪ corpus). The histogram
    partials and the final ≤ depth × width rows per group are both
    map-side combined.
    """
    _check_shape(depth, width)
    return sketch_from_counts(
        value_counts(df, group_cols, value_col),
        group_cols,
        depth=depth,
        width=width,
    )


def sketch_from_counts(
    counts: DataFrame,
    group_cols: list[str],
    *,
    value_col: str = "_v",
    cnt_col: str = "cnt",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Count-min sketch from a pre-aggregated ``(group..., value,
    count)`` histogram (:func:`value_counts` output, a persisted
    top-token table, or any weighted value relation)."""
    _check_shape(depth, width)
    depths = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    rows = counts.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        F.col(cnt_col).alias("_cnt"),
        depths,
    )
    return (
        rows.withColumn("bucket", cm_bucket("_v", F.col("d"), width))
        .groupBy(*group_cols, "d", "bucket")
        .agg(F.sum("_cnt").alias("cnt"))
    )


def rollup_freq(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Sketch at a coarser grouping: counter matrices add elementwise,
    so the rollup is ``SUM(cnt)`` over ``(group..., d, bucket)`` —
    sketch rows only, raw data never re-read. ``group_cols=[]`` gives
    the single global sketch."""
    return sketches.groupBy(*group_cols, "d", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def estimate_counts(
    sketches: DataFrame,
    probes: DataFrame,
    probe_col: str,
    *,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Estimated occurrence count for each probe value against a
    GLOBAL sketch (``group_cols=[]`` form): ``est = min over d`` of
    the matched counter, 0 when no counter row exists (value count
    is 0 modulo collisions).

    ``depth``/``width`` must match the build call — the sketch rows do
    not carry their own shape. The sketch is <= depth x width rows BY
    CONSTRUCTION (KBs at any data size), so it is the broadcast side;
    probes stay partitioned, the join is map-side, and an absent
    counter row joins to NULL -> 0.

    Rejects grouped sketch tables (extra columns beyond d/bucket/cnt):
    joining on (d, bucket) alone would match counters from EVERY
    group, and min() over those can fall BELOW the true global count —
    silently violating the overcount guarantee. Use
    :func:`estimate_counts_grouped`, or :func:`rollup_freq` to [] first.
    """
    _check_shape(depth, width)
    if set(sketches.columns) != {"d", "bucket", "cnt"}:
        raise ValueError(
            "estimate_counts needs a GLOBAL sketch with columns "
            f"{{d, bucket, cnt}}, got {sorted(sketches.columns)}; use "
            "estimate_counts_grouped for grouped sketches or "
            "rollup_freq(sketches, []) to collapse groups first"
        )
    depths = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    keyed = probes.select(F.col(probe_col).alias("probe")).distinct().select(
        "probe", depths
    )
    keyed = keyed.withColumn("bucket", cm_bucket("probe", F.col("d"), width))
    joined = keyed.join(F.broadcast(sketches), ["d", "bucket"], "left").select(
        "probe", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy("probe").agg(F.min("cnt").alias("est"))


def estimate_counts_grouped(
    sketches: DataFrame,
    group_cols: list[str],
    probes: DataFrame,
    probe_col: str,
    *,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Per-group estimates: ``(group..., probe, est)`` for every
    (group, probe) combination against a GROUPED sketch table — "how
    often does each suspect token appear in EACH source", answered
    from the pre-aggregate alone.

    The (group × probe × depth) grid is built by cross-joining the
    sketch's distinct groups with the broadcast probe set, then
    left-joining the sketch rows; absent counters are zero, so a
    (group, probe) pair with no counter at some depth correctly
    estimates 0. Everything after the tiny distinct-groups aggregate
    is grid-sized (groups × probes × depth rows), never corpus-sized.
    """
    if not group_cols:
        raise ValueError(
            "group_cols must be non-empty (use estimate_counts for the "
            "global sketch)"
        )
    _check_shape(depth, width)
    depths = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    keyed = probes.select(F.col(probe_col).alias("probe")).distinct().select(
        "probe", depths
    )
    keyed = keyed.withColumn("bucket", cm_bucket("probe", F.col("d"), width))
    groups = sketches.select(*group_cols).distinct()
    grid = groups.crossJoin(F.broadcast(keyed))
    joined = grid.join(
        sketches, [*group_cols, "d", "bucket"], "left"
    ).select(
        *group_cols, "probe", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy(*group_cols, "probe").agg(F.min("cnt").alias("est"))


def estimate_error_bound(n_total: int, width: int) -> float:
    """The standard count-min additive error bound: with probability
    ``>= 1 - e^-depth`` the estimate exceeds the true count by at most
    ``e / width * n_total`` (e = Euler's number)."""
    import math

    return math.e / width * n_total


def estimate_join_size(
    a: DataFrame,
    b: DataFrame,
) -> DataFrame:
    """Equi-join cardinality estimate from two GLOBAL count-min
    sketches built over the two join keys (same depth/width family):
    one row ``(est,)`` with

        est = min over d of  Σ_bucket  cntA(d, bucket) · cntB(d, bucket)

    — the count-min inner product. The true size of ``A ⋈ B`` on key
    k is Σ_k cA(k)·cB(k); hashing into a shared bucket only ADDS
    cross terms, so every depth row's inner product is an upper bound
    and the min is the tightest (never an undercount — the same
    one-sided guarantee as :func:`estimate_counts`, proven in tests).

    This is the pre-flight answer to "how big is this join going to
    be" at the cost of two sketches instead of running the join:
    paired with :func:`skew_report <..skew.skew_report>` it decides
    broadcast-vs-shuffle and salting BEFORE committing a 100 TB
    shuffle. Sketches are depth×width rows, so this entire estimate
    computes in milliseconds from pre-aggregated state.

    Accuracy is ADDITIVE, not relative: the expected collision excess
    is ~ ``N_a · N_b / width`` (AGMS/count-min inner-product bound),
    so size ``width`` to the join at hand — the answer this gives is
    the ORDER OF MAGNITUDE ("tens of thousands or billions?"), which
    is exactly what the broadcast/salt decision needs; it is not a
    row-accurate cardinality estimator.
    """
    for name, s in (("a", a), ("b", b)):
        if set(s.columns) != {"d", "bucket", "cnt"}:
            raise ValueError(
                f"estimate_join_size needs GLOBAL sketches with columns "
                f"{{d, bucket, cnt}}; sketch {name} has {sorted(s.columns)}"
            )
    prod = a.alias("a").join(
        b.alias("b"), ["d", "bucket"]
    ).select("d", (F.col("a.cnt") * F.col("b.cnt")).alias("p"))
    per_row = prod.groupBy("d").agg(F.sum("p").alias("ip"))
    return per_row.agg(F.min("ip").alias("est"))
