"""Snapshot-diff classification invariants (operators/diff.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.diff import (
    diff_summary,
    snapshot_diff,
)


def _diff_map(df):
    return {r["k"]: r["change"] for r in df.collect()}


def test_classification(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k int, v string, n int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CC", 30), (4, "d", 41), (5, "e", 50)],
        "k int, v string, n int",
    )
    got = _diff_map(snapshot_diff(old, new, ["k"]))
    assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}
    # unchanged rows appear only on request
    full = _diff_map(snapshot_diff(old, new, ["k"], include_unchanged=True))
    assert full[2] == "unchanged"

    summary = {
        r["change"]: r["n_keys"] for r in diff_summary(old, new, ["k"]).collect()
    }
    assert summary == {"added": 1, "removed": 1, "changed": 2, "unchanged": 1}


def test_null_safety_and_column_order(spark):
    # ('a', NULL) vs (NULL, 'a') must classify as CHANGED — the naive
    # concat_ws hash would collapse both to 'a' and report unchanged
    old = spark.createDataFrame([(1, "a", None)], "k int, x string, y string")
    new = spark.createDataFrame([(1, None, "a")], "k int, x string, y string")
    assert _diff_map(snapshot_diff(old, new, ["k"])) == {1: "changed"}
    # NULL == NULL counts as equal (no spurious 'changed')
    assert (
        snapshot_diff(old, old, ["k"], include_unchanged=True).first()["change"]
        == "unchanged"
    )


def test_compare_cols_subset_and_projection_order(spark):
    old = spark.createDataFrame([(1, "a", 1)], "k int, v string, ignored int")
    new = spark.createDataFrame([(1, "a", 999)], "k int, v string, ignored int")
    # explicit subset: the differing column is not compared
    assert snapshot_diff(old, new, ["k"], ["v"]).count() == 0
    # default compare set follows OLD's column order, so a reordered
    # new-side projection does not flip hashes
    reordered = new.select("ignored", "k", "v")
    got = _diff_map(snapshot_diff(old, reordered, ["k"], ["v"]))
    assert got == {}


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError, match="key_cols"):
        snapshot_diff(df, df, [])
    only_keys = df.select("k")
    with pytest.raises(ValueError, match="compare"):
        snapshot_diff(only_keys, only_keys, ["k"])


def test_matches_incremental_consumption(spark):
    # the added+changed slice is exactly the anti-join + hash-differs
    # set incremental pipelines re-process
    old = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "k int, v string"
    )
    new = spark.createDataFrame(
        [(i, f"v{i}" if i % 5 else f"w{i}") for i in range(10, 60)],
        "k int, v string",
    )
    d = snapshot_diff(old, new, ["k"])
    to_process = {
        r["k"] for r in d.where(F.col("change") != "removed").collect()
    }
    expect = set(range(50, 60)) | {i for i in range(10, 50) if i % 5 == 0}
    assert to_process == expect


def test_content_hash_separator_injection(spark):
    """Values containing the old separator byte (or the NULL sentinel
    text) must not collide across column boundaries: per-column md5
    makes boundaries unambiguous (round-3 advice)."""
    from k_means_using_mapreduce_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a\x1fb", "c"), (2, "<null>", "x")], "k int, c1 string, c2 string"
    )
    new = spark.createDataFrame(
        [(1, "a", "b\x1fc"), (2, None, "x")], "k int, c1 string, c2 string"
    )
    out = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "changed", 2: "changed"}


def test_table_fingerprint_order_independent_and_sensitive(spark):
    """The fingerprint is identical under reordering/repartitioning,
    changes when any value changes, and the distinct count exposes
    XOR-cancelling duplicate pairs."""
    from k_means_using_mapreduce_spark.operators.diff import (
        table_fingerprint,
    )

    rows = [(1, "a"), (2, "b"), (3, None)]
    df = spark.createDataFrame(rows, "id int, s string")
    f1 = table_fingerprint(df, ["id", "s"]).collect()[0]
    shuffled = spark.createDataFrame(
        list(reversed(rows)), "id int, s string"
    ).repartition(7)
    f2 = table_fingerprint(shuffled, ["id", "s"]).collect()[0]
    assert (f1["n"], f1["n_distinct"], f1["xor_hash"]) == (
        f2["n"],
        f2["n_distinct"],
        f2["xor_hash"],
    )
    changed = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None)], "id int, s string"
    )
    f3 = table_fingerprint(changed, ["id", "s"]).collect()[0]
    assert f3["xor_hash"] != f1["xor_hash"]

    # a duplicated row XOR-cancels: n and n_distinct catch it
    doubled = spark.createDataFrame(
        rows + [(2, "b")], "id int, s string"
    )
    f4 = table_fingerprint(doubled, ["id", "s"]).collect()[0]
    assert f4["n"] == 4 and f4["n_distinct"] == 3

    import pytest as _p

    with _p.raises(ValueError, match="non-empty"):
        table_fingerprint(df, [])
