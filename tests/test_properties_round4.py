"""Property tests for the round-4 operators (URL canonicalization,
PageRank, RRF fusion, decayed aggregates): each checked against a
driver-side brute-force model or an algebraic invariant on random
inputs."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------- url canonicalization

url_strategy = st.builds(
    lambda scheme, www, host, port, segs, params, frag: (
        scheme
        + "://"
        + www
        + host
        + port
        + "/"
        + "/".join(segs)
        + ("?" + "&".join(params) if params else "")
        + frag
    ),
    scheme=st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
    www=st.sampled_from(["", "www.", "WWW."]),
    host=st.sampled_from(["ex.com", "a.b.Ex.COM", "x.example.co.uk"]),
    port=st.sampled_from(["", ":80", ":8080"]),
    segs=st.lists(st.sampled_from(["p", "q", "r", ""]), max_size=3),
    params=st.lists(
        st.sampled_from(["a=1", "b=2", "utm_source=x", "gclid=z", "id=9"]),
        max_size=4,
    ),
    frag=st.sampled_from(["", "#top"]),
)


@SETTINGS
@given(urls=st.lists(url_strategy, min_size=1, max_size=8))
def test_canonical_url_is_idempotent(spark, urls):
    """canonical(canonical(u)) == canonical(u): a canonical form that
    re-canonicalizes to something else isn't a canonical form."""
    from k_means_using_mapreduce_spark.functions.urls import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url("url").alias("url"))
    twice = once.select(canonical_url("url").alias("url"))
    assert [r["url"] for r in once.collect()] == [
        r["url"] for r in twice.collect()
    ]


# ------------------------------------------------------------------ pagerank

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6), st.integers(min_value=0, max_value=6)
    ),
    min_size=1,
    max_size=15,
)


@SETTINGS
@given(edges=edges_strategy)
def test_pagerank_matches_python_power_iteration(spark, edges):
    from k_means_using_mapreduce_spark.operators.graph import pagerank

    d, iters = 0.85, 4
    e_df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["node"]: r["rank"] for r in pagerank(e_df, max_iter=iters).collect()
    }

    # driver-side model: same damped formulation incl. dangling mass;
    # edge multiplicity counts as weight (the operator sums unit
    # weights per (src, dst) occurrence row)
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    out_w: dict[int, float] = {}
    for s, _ in edges:
        out_w[s] = out_w.get(s, 0.0) + 1.0
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r for v, r in ranks.items() if v not in out_w)
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += ranks[s] * (1.0 / out_w[s])
        ranks = {
            v: (1 - d) / n + d * (contrib[v] + dangling / n) for v in nodes
        }
    assert set(got) == set(ranks)
    for v in nodes:
        assert math.isclose(got[v], ranks[v], rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)


# ----------------------------------------------------------------- rrf_fuse

ranking_strategy = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.floats(
                min_value=0.0, max_value=10.0, allow_nan=False, allow_infinity=False
            ),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    min_size=1,
    max_size=3,
)


@SETTINGS
@given(lists=ranking_strategy)
def test_rrf_matches_python_recompute(spark, lists):
    from k_means_using_mapreduce_spark.operators.index import rrf_fuse

    k0 = 60
    dfs = [
        spark.createDataFrame(lst, "doc_id long, score double") for lst in lists
    ]
    got = {
        r["doc_id"]: (r["rrf_score"], r["n_lists"])
        for r in rrf_fuse(dfs, k0=k0, top=100).collect()
    }
    want: dict[int, list[float]] = {}
    counts: dict[int, int] = {}
    for lst in lists:
        ranked = sorted(lst, key=lambda t: (-t[1], t[0]))
        for rank, (i, _) in enumerate(ranked, start=1):
            want.setdefault(i, []).append(1.0 / (k0 + rank))
            counts[i] = counts.get(i, 0) + 1
    assert set(got) == set(want)
    for i, parts in want.items():
        assert math.isclose(got[i][0], sum(parts), rel_tol=1e-12)
        assert got[i][1] == counts[i]


# -------------------------------------------------------- decayed aggregate

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=20_000_000),  # ts µs
        st.floats(min_value=-5, max_value=5, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=20,
)


@SETTINGS
@given(rows=events_strategy)
def test_decayed_aggregate_matches_python(spark, rows):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        decayed_aggregate,
    )

    HL, ASOF = 1_500_000, 10_000_000
    df = spark.createDataFrame(
        [(u, ts * 1000, v) for u, ts, v in rows],  # ns storage
        "user_id int, ts long, value double",
    )
    got = {
        r["user_id"]: (r["decayed_sum"], r["decayed_n"])
        for r in decayed_aggregate(
            df, ["user_id"], "value", "ts", half_life_us=HL, asof_us=ASOF
        ).collect()
    }
    want: dict[int, list[tuple[float, float]]] = {}
    for u, ts, v in rows:
        if ts <= ASOF:
            w = 0.5 ** ((ASOF - ts) / HL)
            want.setdefault(u, []).append((v * w, w))
    assert set(got) == set(want)
    for u, parts in want.items():
        assert math.isclose(
            got[u][0], sum(p[0] for p in parts), rel_tol=1e-9, abs_tol=1e-12
        )
        assert math.isclose(got[u][1], sum(p[1] for p in parts), rel_tol=1e-9)
