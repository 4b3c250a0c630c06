"""operators/assoc.py: hand-computed support/confidence/lift,
presence-not-multiplicity semantics, hub-basket cap, direction
asymmetry of confidence, plan shape (broadcast metric joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.assoc import (
    association_rules,
    baskets,
    pair_counts,
)
from k_means_using_mapreduce_spark.plans.explain import (
    broadcast_join_count,
    sort_merge_join_count,
)


@pytest.fixture(scope="module")
def txns(spark):
    # baskets: 1:{x,y} 2:{x,y} 3:{x} 4:{y,z} — n_x=3, n_y=3, n_z=1,
    # n_xy=2, n_yz=1, n_baskets=4
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"), (2, "y"),  # duplicate presence collapses
        (3, "x"),
        (4, "y"), (4, "z"),
    ]
    return spark.createDataFrame(rows, "basket long, item string")


def test_presence_not_multiplicity(txns):
    assert baskets(txns, "basket", "item").count() == 7  # not 8
    pc = {
        (r["item_a"], r["item_b"]): r["n_ab"]
        for r in pair_counts(baskets(txns, "basket", "item")).collect()
    }
    assert pc == {("x", "y"): 2, ("y", "z"): 1}


def test_rules_hand_computed(txns):
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(txns, "basket", "item").collect()
    }
    xy, yx = out[("x", "y")], out[("y", "x")]
    assert xy["n_ab"] == 2 and xy["n_baskets"] == 4
    assert xy["support"] == pytest.approx(0.5)
    assert xy["confidence"] == pytest.approx(2 / 3)  # n_xy / n_x
    assert yx["confidence"] == pytest.approx(2 / 3)  # n_xy / n_y
    # lift symmetric: 2*4/(3*3)
    assert xy["lift"] == yx["lift"] == pytest.approx(8 / 9)
    yz = out[("y", "z")]
    assert yz["confidence"] == pytest.approx(1 / 3)
    assert out[("z", "y")]["confidence"] == pytest.approx(1.0)
    assert yz["lift"] == pytest.approx(4 / 3)  # positively associated


def test_min_pair_count_prunes_both_directions(txns):
    out = association_rules(txns, "basket", "item", min_pair_count=2)
    got = {(r["antecedent"], r["consequent"]) for r in out.collect()}
    assert got == {("x", "y"), ("y", "x")}


def test_hub_basket_cap(txns):
    # cap at 1 item per basket is invalid; cap at 2 keeps all baskets
    # here, but a 3-item basket would be dropped
    extra = txns.sparkSession.createDataFrame(
        [(9, "a"), (9, "b"), (9, "c")], "basket long, item string"
    )
    df = txns.unionAll(extra)
    pc = pair_counts(baskets(df, "basket", "item"), max_basket_size=2)
    got = {(r["item_a"], r["item_b"]) for r in pc.collect()}
    assert got == {("x", "y"), ("y", "z")}  # basket 9's pairs gone
    with pytest.raises(ValueError):
        pair_counts(baskets(df, "basket", "item"), max_basket_size=1)


def test_validation(txns):
    with pytest.raises(ValueError):
        association_rules(txns, "basket", "item", min_pair_count=0)


def test_plan_shape(txns):
    plan = association_rules(txns, "basket", "item")
    # both support lookups broadcast (the 1-row totals rides a
    # broadcast nested-loop cross, counted separately by Spark)
    assert broadcast_join_count(plan) >= 2
    # exactly one sort-merge join: the basket self-join — the explode
    # direction expansion must NOT duplicate the pairs subtree
    assert sort_merge_join_count(plan) <= 1


def test_frequent_sequences_hand_case(spark):
    """Order matters: <a,c> is frequent (2 of 3 sequences) while
    <c,a> never occurs; gaps allowed (u1 matches a..c around b)."""
    from k_means_using_mapreduce_spark.operators.assoc import (
        frequent_sequences,
    )

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"),
        (2, 1, "a"), (2, 2, "c"),
        (3, 1, "b"), (3, 2, "a"),
    ]
    df = spark.createDataFrame(rows, "u long, ts long, item string")
    out = {
        r["pattern"]: r
        for r in frequent_sequences(
            df, "u", "ts", "item", min_support=0.5, tiebreak_col="ts"
        ).collect()
    }
    assert out["a"]["n_sequences"] == 3
    assert out["b"]["n_sequences"] == 2
    assert out["c"]["n_sequences"] == 2
    assert out["a>c"]["n_sequences"] == 2
    assert out["a>c"]["length"] == 2
    assert out["a>c"]["support"] == pytest.approx(2 / 3)
    assert "c>a" not in out and "a>b" not in out

    import pytest as _p

    with _p.raises(ValueError, match="min_support"):
        frequent_sequences(df, "u", "ts", "item", min_support=0.0)
    with _p.raises(ValueError, match="max_pattern_length"):
        frequent_sequences(
            df, "u", "ts", "item", min_support=0.5, max_pattern_length=0
        )


def test_frequent_itemsets_hand_case(spark):
    from k_means_using_mapreduce_spark.operators.assoc import (
        frequent_itemsets,
    )

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "a"), (4, "a"),  # duplicates: presence semantics
    ]
    df = spark.createDataFrame(rows, "b long, item string")
    out = {
        r["itemset"]: r
        for r in frequent_itemsets(
            df, "b", "item", min_support=0.5
        ).collect()
    }
    assert out["a"]["n_baskets"] == 4
    assert out["a&b"]["n_baskets"] == 2
    assert out["a&c"]["n_baskets"] == 2
    assert out["a&b"]["support"] == pytest.approx(0.5)
    assert "b&c" not in out  # support 1/4 < 0.5
    assert "a&b&c" not in out
