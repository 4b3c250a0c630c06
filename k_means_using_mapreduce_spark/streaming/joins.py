"""Watermarked stream-stream joins.

The streaming twin of the batch temporal joins (operators/temporal.py::
asof_join / interval_bucket_join): two live streams joined on an equi
key plus an event-time interval, with watermarks on BOTH sides so the
state store can evict rows that can no longer match.

Scale notes: Spark keeps each side's unmatched rows in keyed state;
without the interval + watermarks that state grows forever. With them,
a row is dropped as soon as the other side's watermark passes the edge
of its match interval, so state is bounded by (input rate × interval +
watermark delay) per key shard — the 1000-executor shape. The equi key
is mandatory: it is what shards the state store; an interval-only join
would broadcast every row to every task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "interval 1 hour",
    upper: str = "interval 0 seconds",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two streams where ``right_ts`` falls inside
    ``[left_ts - lower, left_ts + upper]`` for the same ``key``.

    Both inputs must be streaming DataFrames with real timestamp
    columns; the two column names must differ (they both survive into
    the output). ``how`` may be ``inner``, ``leftOuter``, ``rightOuter``
    or ``fullOuter`` — outer rows emit only once the opposite side's
    watermark proves no match can arrive, which is exactly the
    correctness condition the watermarks exist to prove.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    shared = (set(left.columns) & set(right.columns)) - {key}
    if shared:
        raise ValueError(
            "left/right payload column names must be disjoint (both sides "
            f"survive into the output); rename on one side: {sorted(shared)}"
        )
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] - F.expr(lower))
        & (rw[right_ts] <= lw[left_ts] + F.expr(upper))
    )
    joined = lw.join(rw, cond, how)
    # keep ONE copy of the key (ambiguous otherwise); outer sides may
    # have it null, so coalesce across the two
    return joined.select(
        F.coalesce(lw[key], rw[key]).alias(key),
        *[c for c in left.columns if c != key],
        *[c for c in right.columns if c != key],
    )


def purchase_click_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    *,
    user_col: str = "user_id",
    purchase_ts: str = "purchase_ts",
    click_ts: str = "click_ts",
    attribution_window: str = "interval 30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Last-touch-style attribution stream: every (purchase, click)
    pair from the same user where the click happened within the
    attribution window BEFORE the purchase (half-bounded interval —
    clicks after the purchase never match).

    The streaming twin of the batch asof join
    (operators/temporal.py::asof_join) relaxed to all-matches-in-window
    (streaming state cannot do per-row argmax without a second
    stateful stage; consumers take min/max downstream if they need
    strict last-touch)."""
    return stream_stream_interval_join(
        purchases,
        clicks,
        key=user_col,
        left_ts=purchase_ts,
        right_ts=click_ts,
        lower=attribution_window,
        upper="interval 0 seconds",
        left_watermark=watermark,
        right_watermark=watermark,
        how=how,
    )
