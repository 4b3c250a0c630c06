"""PageRank invariants (operators/graph.py): mass conservation,
dangling redistribution, convergence, known closed forms, weights."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.graph import (
    pagerank,
    transition_edges,
)


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_two_node_cycle_is_uniform(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    r = _ranks(pagerank(e, max_iter=5))
    assert r["a"] == pytest.approx(0.5, abs=1e-12)
    assert r["b"] == pytest.approx(0.5, abs=1e-12)


def test_mass_conserved_with_dangling(spark):
    # c is dangling: its mass must redistribute, total stays 1
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    df = pagerank(e, max_iter=7)
    total = df.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-9)
    r = _ranks(df)
    assert r["c"] > r["b"] > 0  # sink accumulates the most


def test_weights_shift_rank(spark):
    e = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    r = _ranks(pagerank(e, weight_col="w", max_iter=20))
    assert r["b"] > r["c"]  # 90% of a's mass flows to b


def test_tol_early_stop_matches_long_run(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string",
    )
    converged = _ranks(pagerank(e, max_iter=100, tol=1e-12))
    fixed = _ranks(pagerank(e, max_iter=60))
    for k, v in fixed.items():
        assert converged[k] == pytest.approx(v, abs=1e-9)


def test_transition_edges_orders_by_time_then_id(spark):
    rows = [
        # user 1: login(t=1) -> search(t=2) -> buy(t=2, higher id)
        (1, 1, 1_000_000_000, "login"),
        (2, 1, 2_000_000_000, "search"),
        (3, 1, 2_000_000_000, "buy"),
        # user 2: login -> buy
        (4, 2, 1_000_000_000, "login"),
        (5, 2, 9_000_000_000, "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    got = {
        (r["src"], r["dst"]): r["n"] for r in transition_edges(df).collect()
    }
    assert got == {("login", "search"): 1, ("search", "buy"): 1, ("login", "buy"): 1}


def test_validation(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.0)
    with pytest.raises(ValueError, match="max_iter"):
        pagerank(e, max_iter=0)
    empty = e.where(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty)


def test_event_paths_closed_form(spark):
    from k_means_using_mapreduce_spark.operators.graph import event_paths

    rows = [
        (1, 1, 1_000_000_000, "a"),
        (2, 1, 2_000_000_000, "b"),
        (3, 1, 3_000_000_000, "c"),
        (4, 1, 4_000_000_000, "a"),
        (5, 2, 1_000_000_000, "a"),
        (6, 2, 2_000_000_000, "b"),
        (7, 2, 3_000_000_000, "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    got = {
        (r["step_1"], r["step_2"], r["step_3"]): r["n"]
        for r in event_paths(df, steps=3, top=10).collect()
    }
    assert got == {("a", "b", "c"): 2, ("b", "c", "a"): 1}
    two = {
        (r["step_1"], r["step_2"]): r["n"]
        for r in event_paths(df, steps=2, top=10).collect()
    }
    assert two == {("a", "b"): 2, ("b", "c"): 2, ("c", "a"): 1}
    with pytest.raises(ValueError, match="steps"):
        event_paths(df, steps=1)


def test_pagerank_resumable_matches_uninterrupted(spark, tmp_path):
    from k_means_using_mapreduce_spark.operators.graph import (
        pagerank,
        pagerank_resumable,
    )

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )
    full = _ranks(pagerank(e, max_iter=6))

    # run 3 iterations, "crash", resume to 6 with a fresh call
    p = str(tmp_path / "pr")
    pagerank_resumable(e, p, max_iter=3)
    resumed = _ranks(pagerank_resumable(e, p, max_iter=6))
    assert set(resumed) == set(full)
    for k, v in full.items():
        assert resumed[k] == pytest.approx(v, rel=1e-12)

    # re-invocation of a finished run is a no-op returning v6
    again = _ranks(pagerank_resumable(e, p, max_iter=6))
    for k, v in full.items():
        assert again[k] == pytest.approx(v, rel=1e-12)


def test_personalized_pagerank_concentrates_on_seed_neighborhood(spark):
    from k_means_using_mapreduce_spark.operators.graph import pagerank

    # two weakly-connected triangles; teleport pinned to triangle ABC
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x")],
        "src string, dst string",
    )
    uniform = _ranks(pagerank(e, max_iter=20))
    seeded = _ranks(pagerank(e, max_iter=20, personalization={"a": 1.0}))
    assert sum(seeded.values()) == pytest.approx(1.0, abs=1e-9)
    # seed triangle gains rank mass vs the uniform teleport
    abc = lambda r: r["a"] + r["b"] + r["c"]
    assert abc(seeded) > abc(uniform)
    assert seeded["a"] > uniform["a"]
    with pytest.raises(ValueError, match="not in the graph"):
        pagerank(e, max_iter=2, personalization={"nope": 1.0})
    with pytest.raises(ValueError, match="non-empty"):
        pagerank(e, max_iter=2, personalization={})


# ------------------------------------------------------------ triangles


def test_triangle_stats_known_graph(spark):
    """K4 minus one edge: nodes 1-2-3 form a triangle, 4 hangs off 2,3."""
    from k_means_using_mapreduce_spark.operators.graph import triangle_stats

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    by = {r["node"]: r for r in triangle_stats(edges).collect()}
    assert by[1]["degree"] == 2 and by[1]["triangles"] == 1
    assert by[1]["clustering"] == 1.0
    assert by[2]["degree"] == 3 and by[2]["triangles"] == 2
    assert by[2]["clustering"] == pytest.approx(2 / 3)
    assert by[4]["degree"] == 2 and by[4]["triangles"] == 1


def test_triangle_summary_counts_each_triangle_once(spark):
    from k_means_using_mapreduce_spark.operators.graph import (
        triangle_summary,
    )

    # two triangles sharing edge (1,2)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)], "src long, dst long"
    )
    row = triangle_summary(edges).collect()[0]
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 5
    assert row["n_triangles"] == 2
    # wedges: deg = [3,3,2,2] -> 3+3+1+1 = 8; closed 3*2=6 -> 0.75
    assert row["global_clustering"] == pytest.approx(0.75)


def test_triangle_free_graph(spark):
    from k_means_using_mapreduce_spark.operators.graph import (
        triangle_stats,
        triangle_summary,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"  # a path
    )
    assert all(
        r["triangles"] == 0 and r["clustering"] == 0.0
        for r in triangle_stats(edges).collect()
    )
    row = triangle_summary(edges).collect()[0]
    assert row["n_triangles"] == 0 and row["global_clustering"] == 0.0


def test_cooccurrence_edges_cap_and_canonical(spark):
    from k_means_using_mapreduce_spark.operators.graph import (
        cooccurrence_edges,
    )

    rows = [(u, "g1") for u in range(5)] + [(u, "g2") for u in range(50)]
    df = spark.createDataFrame(rows, "uid long, grp string")
    out = cooccurrence_edges(
        df, "uid", ["grp"], max_group_size=10
    ).collect()
    # g2 (50 members) dropped by the cap; g1 gives C(5,2)=10 pairs
    assert len(out) == 10
    assert all(r["src"] < r["dst"] for r in out)
    # duplicate membership rows must not duplicate edges
    df2 = spark.createDataFrame(
        [(1, "g"), (1, "g"), (2, "g")], "uid long, grp string"
    )
    assert cooccurrence_edges(df2, "uid", ["grp"]).count() == 1


def test_markov_sequence_scores_hand_computed(spark):
    import math

    from k_means_using_mapreduce_spark.operators.graph import (
        markov_sequence_scores,
    )

    # transitions: a->b x2 (u1, u2), a->c x1 (u2), b->a x1 (u1)
    # outgoing from a: P(b|a) = 2/3, P(c|a) = 1/3; from b: P(a|b) = 1
    rows = [
        (1, 1, "a", 1000), (2, 1, "b", 2000), (3, 1, "a", 3000),
        (4, 2, "a", 1000), (5, 2, "b", 2000),
        (6, 2, "a", 3000), (7, 2, "c", 4000),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long"
    )
    out = {r["user"]: r for r in markov_sequence_scores(ev).collect()}
    assert out[1]["n_transitions"] == 2
    lp1 = math.log(2 / 3) + math.log(1.0)
    assert out[1]["logprob_sum"] == pytest.approx(lp1)
    assert out[1]["perplexity"] == pytest.approx(math.exp(-lp1 / 2))
    assert out[2]["n_transitions"] == 3
    lp2 = math.log(2 / 3) + math.log(1.0) + math.log(1 / 3)
    assert out[2]["logprob_sum"] == pytest.approx(lp2)


def test_sssp_weighted_chain_and_budget(spark):
    from k_means_using_mapreduce_spark.operators.graph import sssp_weighted

    # a -1.0-> b -1.0-> c -1.0-> d, plus a costly shortcut a -10-> d
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0),
         ("a", "d", 10.0)],
        "src string, dst string, w double",
    )
    src = spark.createDataFrame([("a",)], "node string")
    full = {
        r["node"]: r["dist"]
        for r in sssp_weighted(edges, src, rounds=4).collect()
    }
    assert full == {"a": 0.0, "b": 1.0, "c": 2.0, "d": 3.0}
    # with a 1-edge budget, d is only reachable via the shortcut
    one = {
        r["node"]: r["dist"]
        for r in sssp_weighted(edges, src, rounds=1).collect()
    }
    assert one["d"] == 10.0 and one["b"] == 1.0 and "c" not in one


def test_sssp_undirected_and_guards(spark):
    from k_means_using_mapreduce_spark.operators.graph import sssp_weighted

    edges = spark.createDataFrame(
        [("x", "y", 2.0)], "src string, dst string, w double"
    )
    src = spark.createDataFrame([("y",)], "node string")
    # directed: nothing leaves y; undirected: x at 2.0
    assert len(sssp_weighted(edges, src, rounds=3).collect()) == 1
    und = {
        r["node"]: r["dist"]
        for r in sssp_weighted(
            edges, src, rounds=3, directed=False
        ).collect()
    }
    assert und["x"] == 2.0
    import pytest as _p

    with _p.raises(ValueError):
        sssp_weighted(edges, src, rounds=-1)


def test_assortativity_star_vs_clique(spark):
    from k_means_using_mapreduce_spark.operators.graph import (
        degree_assortativity,
    )

    # star: hub degree n-1, leaves degree 1 -> strongly disassortative
    star = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(6)], "src string, dst string"
    )
    r = degree_assortativity(star).collect()[0]
    assert r["n_nodes"] == 7 and r["n_edges"] == 6
    assert r["assortativity"] == pytest.approx(-1.0)

    # regular graph (cycle): every degree 2 -> zero variance -> NULL
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src int, dst int"
    )
    assert degree_assortativity(cyc).collect()[0]["assortativity"] is None


def test_assortativity_ignores_self_loops_and_duplicates(spark):
    from k_means_using_mapreduce_spark.operators.graph import (
        degree_assortativity,
    )

    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "a"), ("a", "b")],
        "src string, dst string",
    )
    r = degree_assortativity(df).collect()[0]
    assert r["n_nodes"] == 2 and r["n_edges"] == 1


def test_reciprocity_hand_cases(spark):
    from k_means_using_mapreduce_spark.operators.graph import reciprocity

    # a<->b mutual, a->c one-way, self-loop and duplicate ignored
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("a", "a"), ("a", "b")],
        "src string, dst string",
    )
    r = reciprocity(df).collect()[0]
    assert r["n_edges"] == 3
    assert r["n_reciprocal"] == 2
    assert r["reciprocity"] == pytest.approx(2.0 / 3.0)
    # empty graph: NULL ratio
    empty = spark.createDataFrame([], "src string, dst string")
    assert reciprocity(empty).collect()[0]["reciprocity"] is None


def _hmm_events(spark, types, user=1):
    rows = [
        (i + 1, 1_000_000_000 * (i + 1), user, t, 1.0)
        for i, t in enumerate(types)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double",
    )


def test_hmm_viterbi_matches_brute_force_path_max(spark):
    """The recursion's final max(v0, v1) equals the exhaustive maximum
    over all 2^T hidden paths, and the decode flips to the transact
    state on a purchase-heavy tail."""
    import itertools
    import math

    from k_means_using_mapreduce_spark.operators.graph import (
        hmm_viterbi_scores,
    )

    emit = {
        "view": (0.35, 0.10),
        "click": (0.35, 0.15),
        "purchase": (0.10, 0.40),
    }
    trans = ((0.85, 0.15), (0.25, 0.75))
    init = (0.7, 0.3)
    types = ["view", "click", "purchase", "purchase", "purchase"]
    r = hmm_viterbi_scores(
        _hmm_events(spark, types),
        emissions=emit,
        transitions=trans,
        initial=init,
    ).collect()[0]

    best = -float("inf")
    for path in itertools.product([0, 1], repeat=len(types)):
        lp = math.log(init[path[0]]) + math.log(emit[types[0]][path[0]])
        for t in range(1, len(types)):
            lp += math.log(trans[path[t - 1]][path[t]])
            lp += math.log(emit[types[t]][path[t]])
        best = max(best, lp)
    assert r["logp"] == pytest.approx(best, abs=1e-12)
    assert r["best_state"] == 1  # purchase run ends in the transact state
    assert r["n"] == len(types)


def test_hmm_viterbi_floor_and_guards(spark):
    """Unseen symbols emit at the floor in both states; invalid
    parameters raise."""
    import math

    from k_means_using_mapreduce_spark.operators.graph import (
        hmm_viterbi_scores,
    )

    emit = {"view": (0.9, 0.1)}
    r = hmm_viterbi_scores(
        _hmm_events(spark, ["mystery"]), emissions=emit, floor=1e-3
    ).collect()[0]
    # single unseen symbol: v_s = ln pi_s + ln floor
    assert r["v0"] == pytest.approx(math.log(0.7) + math.log(1e-3))
    assert r["v1"] == pytest.approx(math.log(0.3) + math.log(1e-3))
    assert r["best_state"] == 0  # tie-free: pi0 > pi1

    with pytest.raises(ValueError, match="non-empty"):
        hmm_viterbi_scores(_hmm_events(spark, ["view"]), emissions={})
    with pytest.raises(ValueError, match="emission probs"):
        hmm_viterbi_scores(
            _hmm_events(spark, ["view"]), emissions={"view": (0.0, 1.0)}
        )
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        hmm_viterbi_scores(
            _hmm_events(spark, ["view"]),
            emissions=emit,
            initial=(1.0, 0.0),
        )
