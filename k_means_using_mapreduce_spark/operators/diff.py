"""Snapshot diff: what changed between two versions of a keyed table.

The read-side complement of the write-side CDC operators
(sources/sinks.py::merge_upsert_parquet applies a change set;
operators/temporal.py::latest_by_key / scd2_history compact and
historize one): given yesterday's corpus snapshot and today's,
classify every key as added / removed / changed / unchanged. Training
pipelines run this constantly — "which documents does the new crawl
add or rewrite?" drives incremental dedup (operators/dedup.py::
dedup_incremental consumes exactly the added+changed slice),
incremental index ingestion, and audit reports.

Spark shape: reduce each side to ``(keys..., row content hash)`` —
pure map-side projection, so only key + compared columns are read
from parquet (column pruning reaches the scan) — then ONE full outer
join on the keys. Two hash exchanges at scale; co-locate both
snapshots with ``sources/sinks.py::write_bucketed_table`` on the key
to make the join shuffle-free. Never a broadcast: both sides are
corpus-sized by assumption.

The content hash is md5 over PER-COLUMN md5 digests (NULL encoded as
a sentinel that no digest can be): each part is either exactly 32
lowercase hex chars or the non-hex sentinel, so the concatenation
decodes uniquely and no value can smuggle a column boundary — a
separator-joined hash would let ``('a\\x1fb', 'c')`` collide with
``('a', 'b\\x1fc')``. md5 keeps the whole classification
engine-portable (DuckDB oracle-checkable), like every hash in this
engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: NULL sentinel inside the content hash — contains ``<``, which md5's
#: hex alphabet never produces, so it cannot collide with or extend a
#: neighbouring digest.
NULL_MARK = "<null>"


def content_hash(cols: list[str]) -> Column:
    """md5 fingerprint of the given columns, NULL-safe and
    order-sensitive (a value moving between columns changes the
    hash). Hashes each column separately before combining so values
    containing any separator byte cannot shift a column boundary."""
    parts = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit(NULL_MARK))
        for c in cols
    ]
    return F.md5(F.concat(*parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    *,
    include_unchanged: bool = False,
) -> DataFrame:
    """Per-key change classification between two snapshots:
    ``(keys..., change)`` with change in ``added`` (key only in
    ``new``), ``removed`` (only in ``old``), ``changed`` (both, hash
    differs), ``unchanged`` (both, hash equal — dropped unless
    ``include_unchanged``).

    ``compare_cols`` defaults to every shared non-key column (in
    ``old``'s column order, so the hash is stable under ``new``-side
    projection reordering). Keys must be unique per snapshot — this
    diffs snapshots, not event logs (compact with ``latest_by_key``
    first).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = [
            c for c in old.columns if c in shared and c not in key_cols
        ]
    if not compare_cols:
        raise ValueError("no columns to compare (snapshots share only keys?)")
    o = old.select(*key_cols, content_hash(compare_cols).alias("_h_old"))
    n = new.select(*key_cols, content_hash(compare_cols).alias("_h_new"))
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(*key_cols, change.alias("change"))
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One row per change class with its key count (unchanged
    included) — the audit-report face of :func:`snapshot_diff`."""
    d = snapshot_diff(
        old, new, key_cols, compare_cols, include_unchanged=True
    )
    return d.groupBy("change").agg(F.count("*").alias("n_keys"))


def table_fingerprint(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-independent content fingerprint of a relation — the
    one-row integrity check in front of :func:`snapshot_diff` (which
    answers WHAT changed; this answers WHETHER anything did, for the
    cost of one scan and an 8-byte comparison): XOR of the per-row
    :func:`content_hash` int60s plus exact row / distinct-row counts.

    XOR is commutative and associative, so the fingerprint is
    identical under any partitioning, row order, or engine — two
    pipeline runs (or a source and its replica) match iff their hash
    multisets match up to XOR-cancelling duplicate PAIRS, which the
    distinct count pins down. Typical use: persist
    ``(n, n_distinct, xor_hash)`` per ingest batch and diff
    fingerprints instead of tables.

    Returns one row ``(n, n_distinct, xor_hash)``.

    Scale shape: one narrow projection (md5 per row, pruned to
    ``cols``) + one combinable aggregate; the distinct count is the
    only shuffle and rides the same 60-bit hash.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    # NOT dedup.md5_int60: content_hash already RETURNS an md5 hex
    # string, so only the 60-bit slice applies (md5_int60 would hash
    # the hash and desync from the oracle's substr(md5(...)))
    h = F.conv(F.substring(content_hash(cols), 1, 15), 16, 10).cast(
        "long"
    )
    rows = df.select(h.alias("_h"))
    return rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("_h").alias("n_distinct"),
        F.expr("bit_xor(_h)").alias("xor_hash"),
    )
