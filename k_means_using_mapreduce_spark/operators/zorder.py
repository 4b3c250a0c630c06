"""Z-order (Morton-curve) multi-column clustering for parquet layouts.

``sources/sinks.py::write_range_sorted`` clusters on ONE sort key:
later predicates on that key prune files via parquet min/max stats,
but a predicate on any other column scans everything. Z-ordering —
the layout behind Delta ``OPTIMIZE ZORDER BY`` and ClickHouse/Databend
space-filling-curve clustering — interleaves the bits of several
columns' bucket ranks into one integer so that sorting by it keeps
rows close in EVERY dimension: each output file then covers a small
hyper-rectangle, and min/max stats prune for predicates on any subset
of the z-columns.

Everything is a JVM codegen expression (shift/or chains; no UDFs):

1. per column, ``width_bucket``-style linear bucketing into
   ``2^bits_per_col`` cells using min/max collected by one tiny
   aggregate (2 doubles per column to the driver, literal-folded back
   into the plan);
2. bit interleaving — column j contributes bit i of its bucket to bit
   ``i * n_cols + j`` of the z-key;
3. ``repartitionByRange`` on the z-key + ``sortWithinPartitions`` —
   the same full-parallelism two-step as the range sink (no global
   total-order stage).

Caveat (documented, standard): linear bucketing degrades under heavy
per-column skew — a hot value concentrates its dimension into one
cell. The rank-based fix is to z-order on a pre-computed percentile
bucket column (operators/robust.py's percentile machinery); the
interleave itself is agnostic to how buckets were derived.

At 100 TB: the stats pass is one partial-combined min/max aggregate;
the write is one range shuffle. Scan savings compound: a daily query
on (event_type, user bucket) over a z-ordered event table reads the
files whose rectangles intersect — typically O(perimeter), not
O(area).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 12


def column_buckets(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits_per_col: int = DEFAULT_BITS,
    method: str = "linear",
) -> dict[str, tuple[float, float] | list[float]]:
    """One aggregate pass collecting per-column bucket parameters.

    ``method="linear"`` → (min, max) per column (2 doubles each);
    ``method="quantile"`` → ``2^bits_per_col - 1`` approx-percentile
    boundaries per column (rank bucketing — the fix for skewed
    columns, where linear buckets collapse the hot range into one cell
    and nothing prunes; measured on the synthetic events table, a 10%
    band on the skewed ``value`` column reads 0.94 of files under
    linear buckets vs 0.50 under quantile — balanced with the other
    dimension, as a space-filling curve should be). Boundaries stay
    modest in size
    (``bits_per_col ≤ 8`` recommended with quantile) and fold into the
    plan as an array literal.
    """
    if method not in ("linear", "quantile"):
        raise ValueError(f"method must be linear|quantile, got {method!r}")
    if method == "quantile":
        n_b = (1 << bits_per_col) - 1
        qs = [i / (n_b + 1) for i in range(1, n_b + 1)]
        aggs = [
            F.percentile_approx(F.col(c).cast("double"), qs).alias(f"_q_{c}")
            for c in cols
        ]
        row = df.agg(*aggs).first()
        out: dict[str, tuple[float, float] | list[float]] = {}
        for c in cols:
            bounds = row[f"_q_{c}"]
            if bounds is None:
                raise ValueError(f"z-order column {c!r} is all-NULL")
            out[c] = [float(b) for b in bounds]
        return out
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs).first()
    out = {}
    for c in cols:
        mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
        if mn is None:
            raise ValueError(f"z-order column {c!r} is all-NULL")
        out[c] = (float(mn), float(mx))
    return out


def _bucket_expr(
    col: Column, spec: tuple[float, float] | list[float], bits: int
) -> Column:
    """Bucket rank in [0, 2^bits - 1] as a long.

    Linear spec (min, max): affine scale; constant columns collapse to
    bucket 0. Quantile spec (boundary list): rank = number of
    boundaries ≤ value, via one array filter over the literal-folded
    boundary array (O(2^bits) comparisons per row — a layout-write
    cost, not a query cost). NULLs sort first via bucket 0.
    """
    n = (1 << bits) - 1
    if isinstance(spec, list):
        bounds = F.array(*[F.lit(float(b)) for b in spec])
        v = col.cast("double")
        rank = F.size(F.filter(bounds, lambda b: b <= v))
        return F.coalesce(
            F.least(F.greatest(rank, F.lit(0)), F.lit(n)).cast("long"),
            F.lit(0).cast("long"),
        )
    mn, mx = spec
    if mx <= mn:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(mn)) / F.lit(mx - mn) * F.lit(float(n))
    return F.coalesce(
        F.least(F.greatest(F.floor(scaled), F.lit(0)), F.lit(n)).cast("long"),
        F.lit(0).cast("long"),
    )


def zorder_key(
    stats: dict[str, tuple[float, float] | list[float]],
    *,
    bits_per_col: int = DEFAULT_BITS,
) -> Column:
    """Morton interleave of the columns' bucket ranks as one bigint.

    Bit ``i`` of column ``j``'s bucket lands at bit ``i * n_cols + j``
    of the key — a pure shift/or chain, whole-stage-codegen'd. Total
    bits = ``bits_per_col * n_cols`` must fit a long (≤ 62).
    """
    cols = list(stats)
    n_cols = len(cols)
    if n_cols < 2:
        raise ValueError("z-order needs at least 2 columns (use range sort for 1)")
    if bits_per_col * n_cols > 62:
        raise ValueError(
            f"bits_per_col={bits_per_col} × {n_cols} cols exceeds a long"
        )
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        b = _bucket_expr(F.col(c), stats[c], bits_per_col)
        for i in range(bits_per_col):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n_cols + j))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits_per_col: int = DEFAULT_BITS,
    n_files: int | None = None,
    mode: str = "overwrite",
    method: str = "linear",
) -> None:
    """Persist parquet z-order-clustered on ``cols``.

    Same two-step as ``write_range_sorted`` (range shuffle on the
    z-key, sort within partitions, full write parallelism); the z-key
    is a transient column dropped before the write — file order
    survives the projection, only the 8 B/row key does not reach disk.
    ``method="quantile"`` switches to rank bucketing for skewed
    columns (see ``column_buckets``; use ``bits_per_col ≤ 8`` there).
    """
    cols = list(cols)
    stats = column_buckets(df, cols, bits_per_col=bits_per_col, method=method)
    zk = zorder_key(stats, bits_per_col=bits_per_col)
    with_key = df.withColumn("_zkey", zk)
    parted = (
        with_key.repartitionByRange(n_files, "_zkey")
        if n_files is not None
        else with_key.repartitionByRange("_zkey")
    )
    parted.sortWithinPartitions("_zkey").drop("_zkey").write.mode(mode).parquet(
        path
    )


def file_prune_fraction(
    spark, path: str, col: str, lo: float, hi: float
) -> float:
    """Fraction of the table's parquet files whose [min, max] for
    ``col`` intersects [lo, hi] — the layout-quality probe the z-order
    tests assert on (footer stats only; no row data is read)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        idx = None
        for i in range(len(md.schema)):
            if md.schema.column(i).name == col:
                idx = i
                break
        if idx is None:
            raise ValueError(f"column {col!r} not in {f}")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                fmin, fmax = None, None
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None or (fmin <= hi and fmax >= lo):
            hit += 1
    return hit / len(files)
