"""operators/quality.py: constraint semantics (incl. null handling and
the unique rule), histogram edges, single-pass plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.quality import (
    check_constraints,
    in_range,
    in_set,
    matches,
    not_null,
    numeric_histogram,
    unique,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, 5.0, "A", "x1"),
        (2, 15.0, "B", "x2"),   # out of range, out of set
        (2, None, "A", "zz"),   # dup id, null value, bad pattern
        (None, 3.0, "A", "x3"),  # null id
    ]
    return spark.createDataFrame(rows, "id long, v double, flag string, code string")


def test_constraints_count_violations(df):
    out = {
        r["rule"]: r
        for r in check_constraints(
            df,
            [
                not_null("id"),
                unique("id"),
                in_range("v", 0, 10),
                in_set("flag", ["A"]),
                matches("code", "x[0-9]"),
            ],
        ).collect()
    }
    assert out["id_not_null"]["violations"] == 1
    assert not out["id_not_null"]["passed"]
    # ids: [1, 2, 2, null] -> distinct incl null = 3 -> 1 duplicate row
    assert out["id_unique"]["violations"] == 1
    # v: 15 out of range, null is a violation too
    assert out["v_in_range"]["violations"] == 2
    assert out["flag_in_set"]["violations"] == 1
    assert out["code_matches"]["violations"] == 1
    assert all(r["n_rows"] == 4 for r in out.values())


def test_constraints_all_pass(spark):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    out = check_constraints(df, [not_null("id"), unique("id")]).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in out)


def test_constraints_validation(df):
    with pytest.raises(ValueError):
        check_constraints(df, [])
    with pytest.raises(ValueError):
        check_constraints(df, [not_null("id"), not_null("id")])


def test_constraints_single_pass(spark, sf_oracle):
    from k_means_using_mapreduce_spark.plans.explain import executed_plan

    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    out = check_constraints(
        li, [not_null("l_orderkey"), in_range("l_quantity", 1, 50)]
    )
    out.collect()
    # one scan, one global aggregate — not one job per rule
    assert executed_plan(out).count("Scan parquet") == 1


def test_histogram_edges_and_clamp(spark):
    df = spark.createDataFrame([(float(v),) for v in range(0, 101)], "x double")
    out = {r["bucket"]: r for r in numeric_histogram(df, "x", bins=10).collect()}
    assert len(out) == 10
    assert out[0]["n"] == 10          # 0..9
    assert out[9]["n"] == 11          # 90..100: max closes the last bucket
    assert out[0]["lo"] == 0.0 and out[9]["hi"] == pytest.approx(100.0)
    assert sum(r["n"] for r in out.values()) == 101


def test_histogram_constant_and_nulls(spark):
    df = spark.createDataFrame([(5.0,), (5.0,), (None,)], "x double")
    out = numeric_histogram(df, "x", bins=4).collect()
    assert len(out) == 1
    assert out[0]["bucket"] == 0 and out[0]["n"] == 2
    empty = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError):
        numeric_histogram(empty, "x")
    with pytest.raises(ValueError):
        numeric_histogram(df, "x", bins=0)


def test_lexical_diversity_closed_form(spark):
    from k_means_using_mapreduce_spark.operators.quality import (
        lexical_diversity,
    )
    import pytest as _pt

    rows = [
        (1, "a a a a"),          # maximal repetition: 1 type / 4 tokens
        (2, "a b c d"),          # maximal diversity: K = 0
        (3, "a a b b"),
        (4, "   "),              # no tokens -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lexical_diversity(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["ttr"] == _pt.approx(0.25)
    assert got[1]["yule_k"] == _pt.approx(10000.0 * (16 - 4) / 16)
    assert got[2]["ttr"] == _pt.approx(1.0)
    assert got[2]["yule_k"] == _pt.approx(0.0)
    assert got[3]["yule_k"] == _pt.approx(10000.0 * (8 - 4) / 16)
    assert got[1]["yule_k"] > got[3]["yule_k"] > got[2]["yule_k"]


def _corr_df(spark):
    rows = [
        (float(i), 2.0 * i + 1.0, float((i * 7) % 5), float(i % 3))
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "a double, b double, c double, d double")


def test_pearson_matrix_matches_numpy(spark):
    import numpy as np

    from k_means_using_mapreduce_spark.operators.quality import (
        correlation_matrix,
    )

    df = _corr_df(spark)
    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in correlation_matrix(df, ["a", "b", "c", "d"]).collect()
    }
    assert len(got) == 6
    m = np.array(df.collect(), dtype=float)
    ref = np.corrcoef(m.T)
    names = ["a", "b", "c", "d"]
    for i in range(4):
        for j in range(i + 1, 4):
            assert got[(names[i], names[j])] == pytest.approx(
                ref[i, j], abs=1e-9
            )
    # exact linear relation
    assert got[("a", "b")] == pytest.approx(1.0)


def test_spearman_matrix_midranks_and_monotone(spark):
    import numpy as np

    from k_means_using_mapreduce_spark.operators.quality import (
        correlation_matrix,
    )

    # y is a nonlinear but strictly monotone function of x -> rho = 1;
    # z has ties to exercise midranks
    rows = [(float(i), float(i) ** 3, float(i % 4)) for i in range(30)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in correlation_matrix(
            df, ["x", "y", "z"], method="spearman"
        ).collect()
    }
    assert got[("x", "y")] == pytest.approx(1.0)

    def midranks(v):
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        i = 0
        sv = np.array(v)[order]
        while i < len(v):
            j = i
            while j < len(v) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return ranks

    xs = [r[0] for r in rows]
    zs = [r[2] for r in rows]
    ref = np.corrcoef(midranks(xs), midranks(zs))[0, 1]
    assert got[("x", "z")] == pytest.approx(ref, abs=1e-9)


def test_correlation_matrix_null_rows_and_guards(spark):
    from k_means_using_mapreduce_spark.operators.quality import (
        correlation_matrix,
    )

    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, None), (3.0, 6.0), (4.0, 8.0)],
        "a double, b double",
    )
    r = correlation_matrix(df, ["a", "b"]).collect()[0]
    assert r["n"] == 3  # complete rows only
    assert r["corr"] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        correlation_matrix(df, ["a"])
    with pytest.raises(ValueError):
        correlation_matrix(df, ["a", "b"], method="kendall")
    # constant column -> NULL not error
    cdf = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0)], "a double, b double"
    )
    assert correlation_matrix(cdf, ["a", "b"]).collect()[0]["corr"] is None


def test_pareto_frontier_hand_case(spark):
    from k_means_using_mapreduce_spark.operators.quality import (
        pareto_frontier,
    )

    # points: (1,5) (2,4) (2,6) (3,3) (3,3) dup, (0,9)
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 4.0), (2.0, 6.0), (3.0, 3.0), (3.0, 3.0),
         (0.0, 9.0)],
        "x double, y double",
    )
    out = {
        (r["x"], r["y"]): r["n_rows"]
        for r in pareto_frontier(df, "x", "y").collect()
    }
    # frontier: (3,3) [best x], (2,6), (0,9); (1,5) dominated by (2,6),
    # (2,4) dominated by (2,6)
    assert out == {(3.0, 3.0): 2, (2.0, 6.0): 1, (0.0, 9.0): 1}


def test_pareto_frontier_min_direction_and_guard(spark):
    from k_means_using_mapreduce_spark.operators.quality import (
        pareto_frontier,
    )

    # minimize x, maximize y: mirror of the hand case on x
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 6.0), (0.0, 2.0)], "x double, y double"
    )
    out = {
        (r["x"], r["y"])
        for r in pareto_frontier(
            df, "x", "y", directions=("min", "max")
        ).collect()
    }
    # nothing dominates anything: (0,2) has best x, (2,6) best y,
    # (1,5) beats (0,2) on y and (2,6) on x
    assert out == {(0.0, 2.0), (1.0, 5.0), (2.0, 6.0)}
    import pytest as _p

    with _p.raises(ValueError):
        pareto_frontier(df, "x", "y", directions=("up", "max"))


def test_association_matrix_identical_and_independent(spark):
    from k_means_using_mapreduce_spark.operators.quality import (
        association_matrix,
    )

    # b duplicates a exactly -> V = 1; c cycles independently of a
    rows = [(str(i % 3), str(i % 3), str((i // 3) % 2)) for i in range(60)]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    out = {
        (r["col_x"], r["col_y"]): r
        for r in association_matrix(df, ["a", "b", "c"]).collect()
    }
    assert out[("a", "b")]["cramers_v"] == pytest.approx(1.0)
    # exact independence by construction: chi2 = 0
    assert out[("a", "c")]["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert out[("a", "c")]["cramers_v"] == pytest.approx(0.0, abs=1e-9)


def test_association_matrix_nulls_are_a_level(spark):
    from k_means_using_mapreduce_spark.operators.quality import (
        association_matrix,
    )

    # a NULL in x always co-occurs with 'z' in y: association present
    rows = [(None, "z"), (None, "z"), ("u", "w"), ("v", "w")]
    df = spark.createDataFrame(rows, "x string, y string")
    r = association_matrix(df, ["x", "y"]).collect()[0]
    assert r["n"] == 4
    assert r["cramers_v"] == pytest.approx(1.0)
    import pytest as _p

    with _p.raises(ValueError):
        association_matrix(df, ["x"])


def test_partial_correlation_removes_confounder(spark):
    from k_means_using_mapreduce_spark.operators.quality import (
        partial_correlation,
    )

    # x and y both driven by z only: marginal r_xy strong, partial ~ 0
    rows = [
        (float(z) + 0.3 * ((i * 7) % 5), float(z) - 0.3 * ((i * 3) % 5),
         float(z))
        for i, z in enumerate(list(range(40)) * 2)
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    r = partial_correlation(df, "x", "y", "z").collect()[0]
    assert r["r_xy"] > 0.9
    assert abs(r["r_xy_given_z"]) < 0.35  # confounder explained it
    # z explains x exactly -> undefined partial, NULL not error
    exact = spark.createDataFrame(
        [(float(i), float(i % 7), float(i)) for i in range(30)],
        "x double, y double, z double",
    )
    assert (
        partial_correlation(exact, "x", "y", "z").collect()[0][
            "r_xy_given_z"
        ]
        is None
    )


def test_uncertainty_coefficient_directionality(spark):
    import math

    from k_means_using_mapreduce_spark.operators.quality import (
        uncertainty_coefficient,
    )

    # y determines x exactly (x = y mod 2) but not vice versa:
    # U(x|y) = 1, U(y|x) < 1
    rows = [(str(y % 2), str(y)) for y in range(4) for _ in range(10)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = uncertainty_coefficient(df, "x", "y").collect()[0]
    assert r["u_x_given_y"] == pytest.approx(1.0)
    assert r["u_y_given_x"] < 0.6
    assert r["h_x"] == pytest.approx(math.log(2.0))
    assert r["h_y"] == pytest.approx(math.log(4.0))
    assert r["mutual_info"] == pytest.approx(math.log(2.0))


def _brute_skyline(rows, criteria):
    def dominates(b, a):
        ge = all(
            (b[c] >= a[c]) if d == "max" else (b[c] <= a[c])
            for c, d in criteria
        )
        gt = any(
            (b[c] > a[c]) if d == "max" else (b[c] < a[c])
            for c, d in criteria
        )
        return ge and gt

    return sorted(
        r["id"]
        for r in rows
        if not any(dominates(b, r) for b in rows if b is not r)
    )


def test_skyline_matches_brute_force_3d(spark):
    """Seeded random 3-criteria points, duplicates included: the
    distributed local-prune + dominance-anti-join pipeline returns
    exactly the brute-force skyline, and duplicates of a frontier
    tuple all survive (no distinct collapse)."""
    import random

    from k_means_using_mapreduce_spark.operators.quality import skyline

    rng = random.Random(11)
    rows = [
        {
            "id": i,
            "x": float(rng.randint(0, 8)),
            "y": float(rng.randint(0, 8)),
            "z": float(rng.randint(0, 8)),
        }
        for i in range(120)
    ]
    rows.append(dict(rows[0], id=999))  # exact duplicate tuple
    criteria = [("x", "max"), ("y", "min"), ("z", "max")]
    df = spark.createDataFrame(
        [(r["id"], r["x"], r["y"], r["z"]) for r in rows],
        "id long, x double, y double, z double",
    ).repartition(7)
    got = sorted(r["id"] for r in skyline(df, criteria).collect())
    assert got == _brute_skyline(rows, criteria)
    # the duplicate pair lives or dies together
    assert (0 in got) == (999 in got)

    # the no-prune path (pure anti-join) agrees
    got2 = sorted(
        r["id"] for r in skyline(df, criteria, local_prune=False).collect()
    )
    assert got2 == got


def test_skyline_nulls_dropped_and_validation(spark):
    from k_means_using_mapreduce_spark.operators.quality import skyline

    df = spark.createDataFrame(
        [(1, 5.0, 1.0), (2, None, 0.0), (3, 4.0, 2.0)],
        "id long, x double, y double",
    )
    out = skyline(df, [("x", "max"), ("y", "max")]).collect()
    ids = sorted(r["id"] for r in out)
    assert ids == [1, 3]  # row 2's NULL criterion excludes it

    with pytest.raises(ValueError, match="criteria"):
        skyline(df, [("x", "max")])
    with pytest.raises(ValueError, match="max"):
        skyline(df, [("x", "max"), ("y", "upward")])


def test_gopher_rules_flags_and_summary(spark):
    """Hand-built documents hitting each rule: a good doc passes all,
    a short doc fails word count, a symbol-heavy doc fails the symbol
    ratio, a bullet wall fails the bullet rule, and the summary's
    failure accounting matches."""
    from k_means_using_mapreduce_spark.operators.quality import (
        gopher_rules,
        gopher_summary,
    )

    good = (
        "the quick brown fox and the lazy dog are with all of this "
        "text that has many plain words " * 3
    )
    short = "too short to pass"
    symbols = " ".join(["the###word..." for _ in range(60)])
    bullets = "\n".join(["- the bullet item of the list"] * 20)
    df = spark.createDataFrame(
        [
            (1, "a", good),
            (2, "a", short),
            (3, "b", symbols),
            (4, "b", bullets),
        ],
        "doc_id long, source string, text string",
    )
    flagged = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert flagged[1]["pass_all"]
    assert not flagged[2]["r_word_count"] and not flagged[2]["pass_all"]
    assert not flagged[3]["r_symbol"]
    assert not flagged[4]["r_bullet"]

    summ = {
        r["source"]: r
        for r in gopher_summary(gopher_rules(df), by="source").collect()
    }
    assert summ["a"]["n_docs"] == 2 and summ["a"]["n_pass"] == 1
    assert summ["a"]["fail_word_count"] == 1
    assert summ["b"]["fail_symbol"] >= 1 and summ["b"]["fail_bullet"] >= 1


def test_inclusion_dependencies_finds_planted_fk(spark):
    """A ⊆ B holds exactly when every A value appears in B; reverse
    direction and overlapping-but-not-contained pairs are rejected."""
    from k_means_using_mapreduce_spark.operators.quality import (
        inclusion_dependencies,
    )

    child = spark.createDataFrame(
        [(1,), (2,), (2,), (3,)], "fk int"
    )
    parent = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (5,)], "pk int"
    )
    sibling = spark.createDataFrame(
        [(3,), (4,), (99,)], "sk int"
    )
    out = {
        (r["lhs"], r["rhs"]): r
        for r in inclusion_dependencies(
            {
                "child.fk": (child, "fk"),
                "parent.pk": (parent, "pk"),
                "sib.sk": (sibling, "sk"),
            }
        ).collect()
    }
    r = out[("child.fk", "parent.pk")]
    assert r["contained"] and r["lhs_values"] == 3 and r["shared_values"] == 3
    # parent has 5 distinct values, only 3 shared with child
    assert not out[("parent.pk", "child.fk")]["contained"]
    # sibling overlaps parent (3, 4) but 99 breaks containment
    assert not out[("sib.sk", "parent.pk")]["contained"]
    assert out[("sib.sk", "parent.pk")]["shared_values"] == 2
    # disjoint-ish pairs with zero overlap are not emitted at all
    assert ("sib.sk", "child.fk") in out  # shares value 3
    import pytest as _p

    with _p.raises(ValueError, match="at least 2"):
        inclusion_dependencies({"a": (child, "fk")})


def test_inclusion_dependencies_recovers_tpch_fk_skeleton(spark, sf_oracle):
    """On the TPC-H tables the discovered IND set contains the true
    foreign-key edges and rejects a non-edge."""
    from k_means_using_mapreduce_spark.contracts.quality_queries import (
        ind_discovery_tpch,
    )

    got = {
        (r["lhs"], r["rhs"])
        for r in ind_discovery_tpch(spark, sf_oracle).collect()
        if r["contained"]
    }
    for edge in [
        ("o_custkey", "c_custkey"),
        ("l_orderkey", "o_orderkey"),
        ("l_partkey", "p_partkey"),
        ("l_suppkey", "s_suppkey"),
        ("c_nationkey", "n_nationkey"),
        ("s_nationkey", "n_nationkey"),
        ("n_regionkey", "r_regionkey"),
    ]:
        assert edge in got, f"missing IND {edge}"
    # custkeys outnumber the 25 nationkeys => reverse never contained
    assert ("c_custkey", "n_nationkey") not in got


def test_nary_inclusion_dependencies_planted_composite(spark):
    """A planted composite FK is found; a pair whose coordinate-wise
    unary INDs both hold but whose TUPLES don't is refuted — the
    spurious-candidate pruning level 2 exists for. (ADVICE/verdict r6
    item: n-ary IND discovery.)"""
    from k_means_using_mapreduce_spark.operators.quality import (
        nary_inclusion_dependencies,
    )

    parent = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "x long, y long"
    )
    child = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 20)], "a long, b long"
    )
    # unary a⊆x and b⊆y hold, but tuples are crossed: (1,20) not in parent
    crossed = spark.createDataFrame(
        [(1, 20), (2, 10)], "a long, b long"
    )
    out = {
        (r["lhs"], r["rhs"]): r
        for r in nary_inclusion_dependencies(
            {
                "parent": (parent, ["x", "y"]),
                "child": (child, ["a", "b"]),
                "crossed": (crossed, ["a", "b"]),
            }
        ).collect()
    }
    assert out[("child", "parent")]["contained"] is True
    assert out[("child", "parent")]["lhs_values"] == 2
    assert out[("child", "parent")]["shared_values"] == 2
    assert out[("parent", "child")]["contained"] is False
    # crossed shares no TUPLE with parent -> pair absent entirely
    assert ("crossed", "parent") not in out

    # null coordinates never witness containment
    withnull = spark.createDataFrame(
        [(1, None), (2, 20)], "a long, b long"
    )
    out2 = {
        (r["lhs"], r["rhs"]): r
        for r in nary_inclusion_dependencies(
            {
                "parent": (parent, ["x", "y"]),
                "wn": (withnull, ["a", "b"]),
            }
        ).collect()
    }
    assert out2[("wn", "parent")]["lhs_values"] == 1
    assert out2[("wn", "parent")]["contained"] is True

    import pytest as _p

    with _p.raises(ValueError, match="arity"):
        nary_inclusion_dependencies(
            {"a": (parent, ["x"]), "b": (child, ["a", "b"])}
        )
    with _p.raises(ValueError, match="at least 2"):
        nary_inclusion_dependencies({"a": (parent, ["x", "y"])})


def test_approximate_fds_g3_error(spark):
    """g3 = min row-removal fraction: hand-computed on a planted
    1-violation dependency; exact FDs give error 0."""
    from k_means_using_mapreduce_spark.operators.quality import (
        approximate_fds,
    )

    df = spark.createDataFrame(
        [
            (1, "a", "x"),
            (1, "a", "x"),
            (1, "a", "y"),  # the one dirty row: 1 -> {x, x, y}
            (2, "b", "z"),
            (2, "b", "z"),
        ],
        "k long, u string, v string",
    )
    out = {
        (r["det"], r["dep"]): r
        for r in approximate_fds(df, ["k", "u", "v"], max_error=0.25).collect()
    }
    # k -> v: keep max per k = 2 (x) + 2 (z) = 4 of 5 -> error 0.2
    r = out[("k", "v")]
    assert r["n"] == 5 and r["keep"] == 4
    assert r["error"] == pytest.approx(0.2)
    assert r["holds"] is True  # 0.2 <= 0.25
    # k <-> u is exact both ways
    assert out[("k", "u")]["error"] == 0.0 and out[("k", "u")]["holds"]
    assert out[("u", "k")]["error"] == 0.0
    # v -> k: x->1, y->1, z->2 exact
    assert out[("v", "k")]["error"] == 0.0

    import pytest as _p

    with _p.raises(ValueError, match="max_error"):
        approximate_fds(df, ["k", "u"], max_error=1.0)
    with _p.raises(ValueError, match=">= 2"):
        approximate_fds(df, ["k"])


def test_conditional_fds_partition_scoped(spark):
    """det -> dep holds inside one condition partition, violated in
    the other; NULLs on any column are excluded."""
    from k_means_using_mapreduce_spark.operators.quality import (
        conditional_fds,
    )

    df = spark.createDataFrame(
        [
            ("F", 1, "HIGH"),
            ("F", 1, "HIGH"),
            ("F", 2, "LOW"),
            ("O", 3, "HIGH"),
            ("O", 3, "LOW"),   # violation inside O
            ("O", 4, "LOW"),
            (None, 5, "LOW"),  # NULL condition: excluded
            ("F", None, "X"),  # NULL det: excluded
        ],
        "status string, clerk long, prio string",
    )
    out = {
        r["cond_value"]: r
        for r in conditional_fds(df, "clerk", "prio", "status").collect()
    }
    assert set(out) == {"F", "O"}
    assert out["F"]["holds"] is True and out["F"]["violations"] == 0
    assert out["F"]["n"] == 3 and out["F"]["n_det"] == 2
    assert out["O"]["holds"] is False and out["O"]["violations"] == 1


def test_ind_apriori_candidates_unary_to_pairs():
    """Level 1 → 2: three coordinate-wise unary INDs R→S generate the
    three canonical column-pair candidates; an IND into a different
    relation never mixes in."""
    from k_means_using_mapreduce_spark.operators.quality import (
        ind_apriori_candidates,
    )

    unary = [
        (("R", ("a",)), ("S", ("x",))),
        (("R", ("b",)), ("S", ("y",))),
        (("R", ("c",)), ("S", ("z",))),
        (("R", ("a",)), ("T", ("t",))),
    ]
    cands = ind_apriori_candidates(unary)
    assert (("R", ("a", "b")), ("S", ("x", "y"))) in cands
    assert (("R", ("a", "c")), ("S", ("x", "z"))) in cands
    assert (("R", ("b", "c")), ("S", ("y", "z"))) in cands
    # R→S pairs never combine with the R→T unary
    assert all(
        rhs[0] == "S" for _, rhs in cands if _[0] == "R" and rhs[0] != "T"
    )
    assert len([c for c in cands if c[1][0] == "T"]) == 0
    assert len(cands) == 3


def test_ind_apriori_candidates_pruning_at_level3():
    """Level 2 → 3: the triple survives only when ALL THREE pair
    projections are verified — removing (b,c)⊆(y,z) kills it."""
    from k_means_using_mapreduce_spark.operators.quality import (
        ind_apriori_candidates,
    )

    full = [
        (("R", ("a", "b")), ("S", ("x", "y"))),
        (("R", ("a", "c")), ("S", ("x", "z"))),
        (("R", ("b", "c")), ("S", ("y", "z"))),
    ]
    assert ind_apriori_candidates(full) == [
        (("R", ("a", "b", "c")), ("S", ("x", "y", "z")))
    ]
    assert ind_apriori_candidates(full[:2]) == []


def test_ind_apriori_candidates_guards_and_degenerates():
    from k_means_using_mapreduce_spark.operators.quality import (
        ind_apriori_candidates,
    )

    assert ind_apriori_candidates([]) == []
    with pytest.raises(ValueError, match="arity"):
        ind_apriori_candidates([(("R", ("a",)), ("S", ("x", "y")))])
    with pytest.raises(ValueError, match="one arity"):
        ind_apriori_candidates(
            [
                (("R", ("a",)), ("S", ("x",))),
                (("R", ("a", "b")), ("S", ("x", "y"))),
            ]
        )
    # repeated columns on either side never form a candidate
    assert (
        ind_apriori_candidates(
            [
                (("R", ("a",)), ("S", ("x",))),
                (("R", ("b",)), ("S", ("x",))),
            ]
        )
        == []
    )


def test_ind_lattice_walk_end_to_end(spark):
    """Full 1→2→3 walk on planted data: child (a,b,c) ⊆ parent
    (x,y,z) exactly; a decoy column d ⊆ x unary-holds but its pair
    with b fails, so no triple containing d is ever generated — and
    the level-3 verification confirms the surviving triple."""
    from k_means_using_mapreduce_spark.operators.quality import (
        ind_apriori_candidates,
        inclusion_dependencies,
        nary_inclusion_dependencies,
    )

    parent = spark.createDataFrame(
        [(i, i * 10, i * 100) for i in range(1, 9)],
        "x long, y long, z long",
    )
    child = spark.createDataFrame(
        [(i, i * 10, i * 100, 9 - i) for i in (1, 2, 3)],
        "a long, b long, c long, d long",
    )
    # level 1
    unary_sources = {
        f"C.{c}": (child, c) for c in ("a", "b", "c", "d")
    } | {f"P.{c}": (parent, c) for c in ("x", "y", "z")}
    l1 = {
        (r["lhs"], r["rhs"])
        for r in inclusion_dependencies(unary_sources).collect()
        if r["contained"]
    }
    assert ("C.a", "P.x") in l1 and ("C.d", "P.x") in l1
    survivors1 = [
        (("C", (lc.split(".")[1],)), ("P", (rc.split(".")[1],)))
        for lc, rc in l1
        if lc.startswith("C.") and rc.startswith("P.")
    ]
    # level 2 candidates -> verify
    cand2 = ind_apriori_candidates(survivors1)
    assert (("C", ("a", "d")), ("P", ("x", "x"))) not in cand2  # dup rhs
    sources2 = {}
    for (lrel, lc), (rrel, rc) in cand2:
        sources2[f"C.{'+'.join(lc)}"] = (child, list(lc))
        sources2[f"P.{'+'.join(rc)}"] = (parent, list(rc))
    l2 = {
        (r["lhs"], r["rhs"])
        for r in nary_inclusion_dependencies(sources2).collect()
        if r["contained"]
    }
    survivors2 = [
        (("C", tuple(lc.split(".")[1].split("+"))),
         ("P", tuple(rc.split(".")[1].split("+"))))
        for lc, rc in l2
        if lc.startswith("C.") and rc.startswith("P.")
        # keep only coordinate-aligned verified pairs from the
        # candidate list (the set check below is what matters)
    ]
    survivors2 = [c for c in cand2 if c in set(survivors2)]
    assert (("C", ("a", "b")), ("P", ("x", "y"))) in survivors2
    # level 3
    cand3 = ind_apriori_candidates(survivors2)
    assert (("C", ("a", "b", "c")), ("P", ("x", "y", "z"))) in cand3
    assert all("d" not in lhs[1] for lhs, _ in cand3)
    sources3 = {"C.abc": (child, ["a", "b", "c"]),
                "P.xyz": (parent, ["x", "y", "z"])}
    rows = {
        (r["lhs"], r["rhs"]): r["contained"]
        for r in nary_inclusion_dependencies(sources3).collect()
    }
    assert rows[("C.abc", "P.xyz")] is True
    assert rows[("P.xyz", "C.abc")] is False


def test_nary_fd_planted_composite_determinant(spark):
    """(a, b) -> c holds while neither a -> c nor b -> c does — a
    GENUINELY composite (minimal) FD — and (a, b) -> d is violated by
    exactly one extra triple. Hand-computed counts."""
    from k_means_using_mapreduce_spark.operators.quality import (
        nary_functional_dependencies,
    )

    rows = [
        # c = a XOR b (composite-determined, not by either alone)
        (0, 0, 0, 1),
        (0, 1, 1, 1),
        (1, 0, 1, 1),
        (1, 1, 0, 1),
        (1, 1, 0, 2),  # same (a,b) -> same c, but d differs: violates d
    ]
    df = spark.createDataFrame(rows, "a int, b int, c int, d int")
    out = {
        (r["det_a"], r["det_b"], r["dep"]): r
        for r in nary_functional_dependencies(
            df, ["a", "b", "c", "d"]
        ).collect()
    }
    r = out[("a", "b", "c")]
    assert r["holds"] == 1 and r["implied_by_unary"] == 0
    assert r["n_groups"] == 4 and r["n_triples"] == 4
    r = out[("a", "b", "d")]
    assert r["holds"] == 0 and r["violations"] == 1
    # c -> a fails but (b, c) -> a holds (XOR again), minimal
    r = out[("b", "c", "a")]
    assert r["holds"] == 1 and r["implied_by_unary"] == 0
    # every candidate pair emitted: 6 pairs x 2 deps
    assert len(out) == 12


def test_nary_fd_implied_flag_and_nulls(spark):
    """A key column makes every composite containing it hold AND be
    flagged implied; NULL rows are excluded per candidate."""
    from k_means_using_mapreduce_spark.operators.quality import (
        nary_functional_dependencies,
    )

    rows = [(1, 10, "x"), (2, 10, "y"), (3, None, "y"), (4, 20, "x")]
    df = spark.createDataFrame(rows, "k int, g int, s string")
    out = {
        (r["det_a"], r["det_b"], r["dep"]): r
        for r in nary_functional_dependencies(df, ["k", "g", "s"]).collect()
    }
    r = out[("k", "g", "s")]
    assert r["holds"] == 1 and r["implied_by_unary"] == 1
    assert r["n_groups"] == 3  # the NULL-g row is excluded
    import pytest as _pytest

    with _pytest.raises(ValueError, match=">= 3"):
        nary_functional_dependencies(df, ["k", "g"])


def test_nary_fd_degenerate_all_null_candidate_emitted(spark):
    """A candidate whose every row has a NULL in one of its three
    columns (here: z is entirely NULL) must still be emitted with
    n_groups = n_triples = 0 and the vacuous-truth convention
    holds = 1 / implied_by_unary = 1 — matching the per-candidate
    UNION ALL oracle, verified against DuckDB on the same frame
    (ADVICE r8: the groupBy chain used to silently drop it)."""
    import duckdb
    import pandas as pd

    from k_means_using_mapreduce_spark.contracts.quality_queries import (
        _fd_nary_sql,
    )
    from k_means_using_mapreduce_spark.operators.quality import (
        nary_functional_dependencies,
    )

    rows = [(1, 10, 100, None), (2, 10, 200, None), (2, 20, 200, None)]
    df = spark.createDataFrame(rows, "x int, y int, w int, z int")
    cols = ["x", "y", "w", "z"]
    got = {
        (r["det_a"], r["det_b"], r["dep"]): tuple(r)
        for r in nary_functional_dependencies(df, cols).collect()
    }
    # every candidate is emitted: 6 unordered pairs x 2 dependents,
    # including the 9 degenerate ones touching the all-NULL z
    assert len(got) == 12
    degenerate = [k for k in got if "z" in k]
    assert len(degenerate) == 9
    for cand in degenerate:
        # (det_a, det_b, dep, n_groups, n_triples, violations, holds,
        #  implied_by_unary)
        assert got[cand][3:] == (0, 0, 0, 1, 1), cand
    # a fully-non-null candidate is unaffected: (x, y) -> w over 3
    # distinct triples, key-like, implied by x -> w alone
    assert got[("x", "y", "w")][3:] == (3, 3, 0, 1, 1)

    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(rows, columns=cols).astype({"z": "Int64"}),
    )
    oracle = {
        (r[0], r[1], r[2]): tuple(r)
        for r in con.execute(_fd_nary_sql(cols)).fetchall()
    }
    con.close()
    assert {k: tuple(int(v) for v in r[3:]) for k, r in got.items()} == {
        k: tuple(int(v) for v in r[3:]) for k, r in oracle.items()
    }


def test_ind_lattice_walk_reaches_fixpoint_at_level3(spark):
    """A 3-column subset relation: the walk must climb to the level-3
    identity IND and stop there (no level-4 candidates exist over 3
    columns) — and the dense-integer spurious unary INDs must appear
    at level 1 but never survive to level 2 composites they don't
    extend to."""
    from k_means_using_mapreduce_spark.operators.quality import (
        ind_lattice_walk,
    )

    parent = spark.createDataFrame(
        [(i, i * 10, i % 3) for i in range(1, 9)],
        "a int, b int, c int",
    )
    child = parent.where(F.col("a") <= 4)
    out = [
        tuple(r)
        for r in ind_lattice_walk(
            {"P": (parent, ["a", "b", "c"]), "C": (child, ["a", "b", "c"])}
        ).collect()
    ]
    lvls = {r[0] for r in out}
    assert lvls == {1, 2, 3}
    assert (3, "C", "a,b,c", "P", "a,b,c", 4) in out
    # every child column is contained in its parent twin at level 1
    for col in ("a", "b", "c"):
        assert any(
            r[:5] == (1, "C", col, "P", col) for r in out
        ), col


def test_ind_lattice_walk_permuted_rhs(spark):
    """Column-name order differs between the sides: the canonical
    candidate has lhs sorted and a PERMUTED rhs — generated by Apriori
    from the two cross-column unary survivors and verified."""
    from k_means_using_mapreduce_spark.operators.quality import (
        ind_lattice_walk,
    )

    a = spark.createDataFrame([(1, 2), (3, 4)], "x int, y int")
    b = spark.createDataFrame([(2, 1), (4, 3), (6, 5)], "p int, q int")
    out = [
        tuple(r)
        for r in ind_lattice_walk(
            {"A": (a, ["x", "y"]), "B": (b, ["p", "q"])}
        ).collect()
    ]
    assert (2, "A", "x,y", "B", "q,p", 2) in out
    # and the reverse direction is refuted (B has an extra tuple)
    assert not any(r[0] == 2 and r[1] == "B" for r in out)


def test_ind_lattice_walk_max_level_and_guards(spark):
    from k_means_using_mapreduce_spark.operators.quality import (
        ind_lattice_walk,
    )

    parent = spark.createDataFrame([(1, 2), (3, 4)], "a int, b int")
    child = parent.where(F.col("a") == 1)
    srcs = {"P": (parent, ["a", "b"]), "C": (child, ["a", "b"])}
    out = ind_lattice_walk(srcs, max_level=1).collect()
    assert {r["level"] for r in out} == {1}

    with pytest.raises(ValueError, match="must not contain"):
        ind_lattice_walk({"R": (parent, ["a,b"])})
    with pytest.raises(ValueError, match="at least one relation"):
        ind_lattice_walk({})
    # a single attribute has nothing to compare against: empty result,
    # stable schema
    empty = ind_lattice_walk({"P": (parent, ["a"])})
    assert empty.count() == 0
    assert empty.columns == [
        "level", "lhs_rel", "lhs_cols", "rhs_rel", "rhs_cols", "n_values",
    ]
