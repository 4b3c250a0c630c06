"""Output connectors.

Reference parity: O16 — the reducer writes one centroid per call with
mode ``'w'`` inside a loop (reducer.py:56-58), so the output file retains
only the *last* centroid (confirmed by the 1-line golden
Data/Reducers/reducer_1_output.txt). The rebuild implements the intended
semantics: all centroids persisted, atomically, via Spark's committer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_centroids_csv(centroids: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist a ``(cid, features: array<double>)`` centroid relation as
    CSV ``cid,x1,x2,...`` — the corrected O16 sink."""
    row = centroids.select("features").first()
    if row is None:
        raise ValueError("write_centroids_csv: centroids relation is empty")
    dim = len(row["features"])
    flat = centroids.select(
        "cid", *[F.col("features")[i].alias(f"c{i}") for i in range(dim)]
    ).orderBy("cid")
    flat.coalesce(1).write.mode(mode).option("header", "true").csv(path)


def write_assignments_parquet(
    assigned: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Persist an assignment relation partitioned by cluster id.

    The scale-aware replacement for the reference's per-reducer text
    partition files (mapper.py:68-71): ``partitionBy('cid')`` gives
    partition-pruned reads for per-cluster consumers (e.g. the IVF
    probe scan reads only the probed buckets)."""
    assigned.write.mode(mode).partitionBy("cid").parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed parquet
    table — the co-located-join layout.

    At 100 TB the dominant join cost is the shuffle of both fact sides;
    two tables bucketed on the join key with the same bucket count join
    with ZERO exchanges (and, when sorted, zero sort) — Spark reads
    bucket i of each side into the same task. This is the storage-level
    twin of `operators/skew.py`'s runtime mitigations, asserted in
    tests/test_bucketing.py.

    Bucketed tables must go through ``saveAsTable`` (the bucket metadata
    lives in the catalog, not the parquet files).

    The pre-write ``repartition(n_buckets, bucket_col)`` matters twice:
    it yields ONE file per bucket (without it every write task emits a
    file into every bucket — T×B small files at scale), and one file
    per bucket is what lets the reader trust ``sortBy`` and elide the
    join-side Sort.
    """
    w = (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: tuple[str, ...],
    *,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist parquet globally range-clustered on ``sort_cols``:
    ``repartitionByRange`` (one range shuffle, sampled boundaries) then
    ``sortWithinPartitions`` — every output file covers a disjoint key
    range, fully sorted inside.

    Why this matters at 100 TB: parquet scans prune row groups by
    min/max statistics, but stats only prune when values are
    CLUSTERED — a key scattered uniformly across files has every
    file's [min, max] spanning the whole domain and nothing prunes.
    Range-clustered layout turns any later ``WHERE key BETWEEN ...``
    into a scan of the few files whose range intersects — the poor
    man's Z-order, and the right layout for time-ordered event tables
    and id-ordered corpus shards. (A global ``orderBy`` before write
    achieves the same clustering but plans a single total-order
    stage; repartitionByRange + per-partition sort is the same layout
    with full write parallelism.)
    """
    if not sort_cols:
        raise ValueError("write_range_sorted requires at least one sort column")
    cols = [F.col(c) for c in sort_cols]
    out = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def compact_parquet(
    spark,
    path: str,
    *,
    target_mb: int = 128,
    sort_within_by: list | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_mb``-sized files;
    returns the new file count.

    The small-files janitor every incremental pipeline needs: streaming
    sinks and per-batch appends leave thousands of KB-scale files whose
    open/footer costs dominate scans at 100 TB. Sizing uses the CURRENT
    on-disk bytes (compressed), so the new files land near target size
    under the same codec. ``sort_within_by`` optionally sorts rows
    within each output file so parquet min/max stats prune after
    compaction (pair with write_range_sorted for a global layout).

    The rewrite goes through a temp dir + rename, so a crash mid-write
    leaves the original directory intact; the swap itself is NOT atomic
    for concurrent readers — coordinate externally (table formats exist
    for that).
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    if not fs.exists(jpath):
        raise ValueError(f"no such path: {path}")
    size = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-size // (target_mb * 1024 * 1024)))  # ceil
    df = spark.read.parquet(path)
    out = df.repartition(int(n_files))
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + "_compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "_compact_old"
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(old)
    if fs.exists(jold):
        fs.delete(jold, True)
    # Hadoop rename signals failure by RETURNING FALSE, not raising —
    # every step must be checked, and nothing may be deleted until the
    # swap has fully succeeded (else a failed swap destroys the only
    # copy, or moves tmp INSIDE the still-present original)
    if not fs.rename(jpath, jold):
        fs.delete(jtmp, True)
        raise IOError(f"compact_parquet: could not move {path} aside")
    if not fs.rename(jtmp, jpath):
        # roll the original back; only then surface the failure
        if not fs.rename(jold, jpath):
            raise IOError(
                f"compact_parquet: swap failed AND rollback failed — "
                f"original data is at {old}"
            )
        fs.delete(jtmp, True)
        raise IOError(f"compact_parquet: could not move compacted data to {path}")
    fs.delete(jold, True)
    return int(n_files)


def merge_upsert_parquet(
    spark,
    path: str,
    updates,
    *,
    key_cols: list,
    order_cols: list,
) -> None:
    """Batch CDC merge: upsert ``updates`` into the parquet dataset at
    ``path`` keeping, per key, the row with the greatest ``order_cols``
    tuple across old + new (operators/temporal.py::latest_by_key
    semantics — make the tuple unique or ties resolve arbitrarily).

    The poor-engineer's MERGE INTO for plain parquet: full rewrite of
    the table through the same checked temp-dir + rename swap as
    :func:`compact_parquet` (crash-safe against data loss; the swap is
    not atomic for concurrent readers — that is what table formats
    add). A full rewrite is the honest cost of keyed mutation on
    immutable files; when updates touch a small key range, partition
    the table and rewrite only affected partitions instead.

    First write: if ``path`` does not exist, updates are deduped by the
    same rule and written directly.
    """
    from ..operators.temporal import latest_by_key

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        latest_by_key(updates, key_cols, order_cols).write.parquet(path)
        return
    current = spark.read.parquet(path)
    merged = latest_by_key(
        current.unionByName(updates.select(*current.columns)),
        key_cols,
        order_cols,
    )
    tmp = path.rstrip("/") + "_merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "_merge_old"
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(old)
    if fs.exists(jold):
        fs.delete(jold, True)
    if not fs.rename(jpath, jold):
        fs.delete(jtmp, True)
        raise IOError(f"merge_upsert_parquet: could not move {path} aside")
    if not fs.rename(jtmp, jpath):
        if not fs.rename(jold, jpath):
            raise IOError(
                f"merge_upsert_parquet: swap failed AND rollback failed — "
                f"original data is at {old}"
            )
        fs.delete(jtmp, True)
        raise IOError(f"merge_upsert_parquet: could not move merged data to {path}")
    fs.delete(jold, True)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    dynamic_overwrite: bool = True,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet write with DYNAMIC partition
    overwrite: ``mode="overwrite"`` replaces only the partitions the
    batch actually contains, leaving every other partition's files
    untouched — the incremental-crawl re-drop pattern ("re-land
    yesterday's shard without wiping the table") that static
    overwrite mode gets catastrophically wrong (it truncates the
    WHOLE table first). The conf is set per-write and restored, so
    the session default is not silently changed for other writers.

    At scale: partition columns should be low-cardinality routing
    keys (date, source, cid) — each distinct combination becomes a
    directory; downstream reads prune on them for free. Pair with
    compact_parquet when many small re-drops accumulate."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    missing = [c for c in partition_cols if c not in df.columns]
    if missing:
        raise ValueError(f"partition columns not in DataFrame: {missing}")
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    try:
        spark.conf.set(key, "dynamic" if dynamic_overwrite else "static")
        df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set(key, prev)
