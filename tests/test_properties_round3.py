"""Property tests for the round-3 operators: each checked against a
driver-side brute-force model on random inputs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

intervals_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=1, max_value=30),
    ),
    min_size=1,
    max_size=25,
)


def _brute_union(ivs):
    """Union of half-open [s, e) intervals, per key, driver-side."""
    out = {}
    for k, s, e in ivs:
        out.setdefault(k, []).append((s, e))
    merged = {}
    for k, spans in out.items():
        spans.sort()
        acc = []
        for s, e in spans:
            if acc and s <= acc[-1][1]:
                acc[-1] = (acc[-1][0], max(acc[-1][1], e))
            else:
                acc.append((s, e))
        merged[k] = acc
    return merged


@SETTINGS
@given(ivs=intervals_strategy)
def test_merge_intervals_equals_brute_force(spark, ivs):
    from k_means_using_mapreduce_spark.operators.temporal import merge_intervals

    rows = [(k, s, s + d) for k, s, d in ivs]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {}
    for r in merge_intervals(df, key_col="k", start_col="s", end_col="e").collect():
        got.setdefault(r["k"], []).append((r["start"], r["end"]))
    for k in got:
        got[k].sort()
    assert got == _brute_union(rows)


changes_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # key
        st.integers(min_value=0, max_value=100),    # ts
        st.sampled_from(["x", "y", "z"]),           # state
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: (t[0], t[1]),  # unique (key, ts): deterministic order
)


@SETTINGS
@given(log=changes_strategy)
def test_scd2_intervals_partition_the_timeline(spark, log):
    from k_means_using_mapreduce_spark.operators.temporal import scd2_history

    df = spark.createDataFrame(log, "k long, ts long, state string")
    rows = scd2_history(df, key_col="k", ts_col="ts", attr_cols=["state"]).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r["valid_from"])
        # contiguous: each interval ends where the next begins
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["state"] != b["state"]  # collapse worked
        assert ivs[-1]["valid_to"] is None and ivs[-1]["is_current"]
        # first interval starts at the key's first event
        first_ts = min(ts for kk, ts, _ in log if kk == k)
        assert ivs[0]["valid_from"] == first_ts


values_strategy = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(vals=values_strategy, bins=st.integers(min_value=1, max_value=7))
def test_histogram_conserves_mass_and_bounds(spark, vals, bins):
    from k_means_using_mapreduce_spark.operators.quality import numeric_histogram

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    rows = numeric_histogram(df, "x", bins=bins).collect()
    assert sum(r["n"] for r in rows) == len(vals)
    assert all(0 <= r["bucket"] < bins for r in rows)
    lo, hi = min(vals), max(vals)
    for r in rows:
        assert r["lo"] >= lo - 1e-9 and r["hi"] <= hi + (hi - lo) / bins + 1e-9


ids_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=500), st.sampled_from(["s1", "s2", "s3"])),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@SETTINGS
@given(rows=ids_strategy, n=st.integers(min_value=1, max_value=5))
def test_cap_per_group_exact_md5_order(spark, rows, n):
    import hashlib

    from k_means_using_mapreduce_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        (r["source"], r["doc_id"])
        for r in cap_per_group(df, "source", "doc_id", n=n).collect()
    }
    expect = set()
    by_src = {}
    for i, s in rows:
        by_src.setdefault(s, []).append(i)
    for s, ids in by_src.items():
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        expect |= {(s, i) for i in ranked[:n]}
    assert got == expect
