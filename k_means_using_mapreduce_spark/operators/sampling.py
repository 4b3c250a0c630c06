"""Deterministic hash-based sampling and dataset splitting.

A training-data pipeline needs samples and train/test splits that are
(a) reproducible run-to-run, (b) stable under Spark task retries and
repartitioning, and (c) consistent across engines. `F.rand()`-based
sampling (and `df.sample`) violates (b): a retried task re-draws its
randomness against a different row order, so a failed-and-recomputed
partition can emit a *different* sample — at 100 TB with thousands of
task retries per job, rand-sampled output is not deterministic.

Hash bucketing fixes all three: bucket = md5(key) mod n is a pure
per-row function of the data. md5 is the one hash Spark and DuckDB
compute identically (lowercase hex; see contracts/_sql_text.py
conventions), so the same expression doubles as the DuckDB oracle —
`conv(substr(md5(x),1,15),16,10)` ≡ `('0x' || substr(md5(x),1,15))::BIGINT`.

Scale: pure map-side projection/filter — zero shuffle, pushes the
filter below everything Catalyst can move it through; sampled scans
read full row groups but decode only selected rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, n_buckets: int) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the key.

    Uses the first 15 hex chars (60 bits) — fits a signed int64, and
    uniform enough that bucket skew is < 0.1% at any realistic n.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    return (h % F.lit(n_buckets)).alias("bucket")


def hash_sample(
    df: DataFrame, key: str, *, keep: int, out_of: int = 100
) -> DataFrame:
    """Keep the deterministic ``keep/out_of`` fraction of rows by key
    hash (e.g. ``keep=10, out_of=100`` ≈ 10%). The same key always
    lands in the same bucket, so samples are consistent across tables
    sharing the key (a join of two 10% samples on the same key is a
    10% sample of the join, not 1%)."""
    if not 0 < keep <= out_of:
        raise ValueError(f"need 0 < keep <= out_of, got {keep}/{out_of}")
    return df.where(hash_bucket(key, out_of) < F.lit(keep))


def train_test_split(
    df: DataFrame, key: str, *, test_pct: int = 10, col_name: str = "split"
) -> DataFrame:
    """Label each row 'train'/'test' by key hash — a disjoint, exhaustive,
    deterministic partition (every key always gets the same label, in
    every run, on every cluster size)."""
    if not 0 < test_pct < 100:
        raise ValueError(f"test_pct must be in (0, 100), got {test_pct}")
    return df.withColumn(
        col_name,
        F.when(hash_bucket(key, 100) < F.lit(test_pct), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )
