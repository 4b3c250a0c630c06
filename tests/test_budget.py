"""operators/budget.py: hand-computed greedy allocation, epoch caps,
exhaustion boundary, zero-budget and validation edges."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark.operators.budget import allocate_budget


@pytest.fixture(scope="module")
def stats(spark):
    # ranked by quality desc: b (0.9, 100 toks), a (0.8, 200), c (0.5, 50)
    rows = [("a", 200, 0.8), ("b", 100, 0.9), ("c", 50, 0.5)]
    return spark.createDataFrame(rows, "source string, tokens long, quality double")


def test_greedy_allocation_hand_computed(stats):
    # max_epochs=2 → capacities b:200, a:400, c:100; budget 450:
    # b takes 200, a takes 250 (partial), c takes 0
    out = {
        r["source"]: r
        for r in allocate_budget(
            stats, total_budget=450.0, max_epochs=2.0
        ).collect()
    }
    assert out["b"]["alloc"] == 200.0 and out["b"]["epochs"] == 2.0
    assert not out["b"]["exhausted"]
    assert out["a"]["alloc"] == 250.0 and out["a"]["epochs"] == 1.25
    assert out["a"]["exhausted"]
    assert out["c"]["alloc"] == 0.0 and out["c"]["exhausted"]
    assert out["a"]["cum_before"] == 200.0 and out["c"]["cum_before"] == 600.0


def test_budget_exceeding_capacity_fills_everything(stats):
    out = allocate_budget(stats, total_budget=1e9, max_epochs=1.0).collect()
    assert all(r["alloc"] == r["capacity"] for r in out)
    assert all(r["epochs"] == 1.0 for r in out)
    assert not any(r["exhausted"] for r in out)


def test_zero_budget(stats):
    out = allocate_budget(stats, total_budget=0.0).collect()
    assert all(r["alloc"] == 0.0 and r["exhausted"] for r in out)


def test_quality_tie_breaks_on_source(spark):
    df = spark.createDataFrame(
        [("y", 100, 0.5), ("x", 100, 0.5)],
        "source string, tokens long, quality double",
    )
    out = {r["source"]: r for r in
           allocate_budget(df, total_budget=100.0).collect()}
    # tie → x first lexically
    assert out["x"]["alloc"] == 100.0 and out["y"]["alloc"] == 0.0


def test_empty_source_has_zero_epochs(spark):
    df = spark.createDataFrame(
        [("e", 0, 0.9), ("f", 10, 0.1)],
        "source string, tokens long, quality double",
    )
    out = {r["source"]: r for r in
           allocate_budget(df, total_budget=5.0).collect()}
    assert out["e"]["alloc"] == 0.0 and out["e"]["epochs"] == 0.0
    assert out["f"]["alloc"] == 5.0


def test_validation(stats):
    with pytest.raises(ValueError):
        allocate_budget(stats, total_budget=-1.0)
    with pytest.raises(ValueError):
        allocate_budget(stats, total_budget=1.0, max_epochs=0.0)


def test_ipf_rake_hits_both_marginals(spark):
    from k_means_using_mapreduce_spark.operators.budget import (
        ipf_rake_weights,
    )

    rows = (
        [("s1", "en")] * 50 + [("s1", "de")] * 10
        + [("s2", "en")] * 20 + [("s2", "de")] * 20
    )
    df = spark.createDataFrame(rows, "src string, lang string")
    cells = ipf_rake_weights(
        df, "src", "lang",
        row_targets={"s1": 0.5, "s2": 0.5},
        col_targets={"en": 0.5, "de": 0.5},
        iters=8,
    ).collect()
    tot = sum(r["n"] * r["weight"] for r in cells)
    for s in ("s1", "s2"):
        share = sum(r["n"] * r["weight"] for r in cells if r["src"] == s) / tot
        assert share == pytest.approx(0.5, abs=1e-6)
    for l in ("en", "de"):
        share = sum(r["n"] * r["weight"] for r in cells if r["lang"] == l) / tot
        assert share == pytest.approx(0.5, abs=1e-6)
    import pytest as _p

    with _p.raises(ValueError, match="sum to 1"):
        ipf_rake_weights(df, "src", "lang",
                         row_targets={"s1": 0.9}, col_targets={"en": 1.0})
