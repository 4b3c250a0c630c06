"""Property-based invariants over random point sets (SURVEY.md §5.3).

Hypothesis drives the *data generation*; each property is checked with
one Spark job per example, so examples are kept few and small — the
point is randomized coverage of degenerate geometries (collinear,
coincident, tiny spreads), not volume.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from k_means_using_mapreduce_spark.operators.kmeans import (
    assign,
    kmeans_fit,
    one_step,
    sse,
)

finite = st.floats(
    min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False
)
point = st.tuples(finite, finite)

points_strategy = st.lists(point, min_size=4, max_size=12, unique=True)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, pts):
    return spark.createDataFrame(
        [([float(x), float(y)],) for x, y in pts], "features array<double>"
    )


def _centroids_from(pts, k):
    return [(i + 1, [float(x), float(y)]) for i, (x, y) in enumerate(pts[:k])]


@given(pts=points_strategy)
@SETTINGS
def test_every_point_assigned_to_true_argmin(spark, pts):
    k = min(3, len(pts))
    cents = _centroids_from(pts, k)
    rows = assign(_df(spark, pts), cents).collect()
    for r in rows:
        dists = {
            cid: sum((a - b) ** 2 for a, b in zip(r["features"], vec))
            for cid, vec in cents
        }
        best = min(dists.items(), key=lambda t: (t[1], t[0]))[0]
        assert r["cid"] == best


@given(pts=points_strategy)
@SETTINGS
def test_one_step_never_increases_sse(spark, pts):
    k = min(3, len(pts))
    cents = _centroids_from(pts, k)
    df = _df(spark, pts)
    before = sse(df, cents).first()["sse"]
    stepped = {r["cid"]: list(r["centroid"]) for r in one_step(df, cents).collect()}
    new_cents = [(cid, stepped.get(cid, vec)) for cid, vec in cents]
    after = sse(df, new_cents).first()["sse"]
    assert after <= before + 1e-9


@given(pts=points_strategy, k=st.integers(min_value=1, max_value=3))
@SETTINGS
def test_fit_invariants(spark, pts, k):
    k = min(k, len(pts))
    res = kmeans_fit(_df(spark, pts), k, seed=7, max_iter=6)
    assert len(res.centroids) == k
    assert sum(res.cluster_sizes.values()) == len(pts)
    assert res.sse >= 0.0
    assert all(math.isfinite(v) for _, vec in res.centroids for v in vec)
    # fixpoint stability: one more step from the converged state moves
    # nothing (only asserted when the loop reported convergence)
    if res.converged:
        stepped = {
            r["cid"]: list(r["centroid"])
            for r in one_step(_df(spark, pts), res.centroids).collect()
        }
        for cid, vec in res.centroids:
            if cid in stepped:
                assert all(
                    abs(a - b) <= 1e-4 + 1e-9 for a, b in zip(vec, stepped[cid])
                )


# --- temporal operator invariants -----------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # user_id
        st.integers(min_value=0, max_value=10_000),     # ts
    ),
    min_size=1,
    max_size=30,
)


@given(evs=events_strategy, gap=st.integers(min_value=1, max_value=5_000))
@SETTINGS
def test_sessionize_matches_python_reference(spark, evs, gap):
    from k_means_using_mapreduce_spark.operators.temporal import sessionize

    rows = [(i, u, t) for i, (u, t) in enumerate(evs)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long")
    got = {
        r["event_id"]: (r["user_id"], r["session_seq"])
        for r in sessionize(df, gap_ns=gap).collect()
    }
    # python reference: per user, sorted by (ts, event_id), split on > gap
    expect = {}
    by_user: dict = {}
    for i, u, t in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        prev = by_user.get(u)
        if prev is None or t - prev[0] > gap:
            seq = (prev[1] + 1) if prev else 1
        else:
            seq = prev[1]
        by_user[u] = (t, seq)
        expect[i] = (u, seq)
    assert got == expect


@given(evs=events_strategy)
@SETTINGS
def test_asof_join_row_count_and_bound(spark, evs):
    """asof output has exactly one row per left row, and every attached
    right ts is the max right ts <= left ts for that key."""
    from k_means_using_mapreduce_spark.operators.temporal import asof_join

    rows = [(i, u, t) for i, (u, t) in enumerate(evs)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long")
    left = df.where("event_id % 2 = 0")
    right = df.where("event_id % 2 = 1")
    out = asof_join(
        left, right, by="user_id", left_ts="ts", right_ts="ts",
        right_cols=["ts"],
    ).collect()
    assert len(out) == left.count()
    rt = {}
    for i, u, t in rows:
        if i % 2 == 1:
            rt.setdefault(u, []).append(t)
    for r in out:
        candidates = [t for t in rt.get(r["user_id"], []) if t <= r["ts"]]
        expect = max(candidates) if candidates else None
        assert r["asof_ts"] == expect
