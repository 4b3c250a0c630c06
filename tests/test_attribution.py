"""operators/attribution.py: hand-computed credits for a tiny event
log, plus the per-conversion credit-sum invariant on every model."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.attribution import (
    DAY_NS,
    attribution_credits,
    attribution_report,
    touch_conversion_pairs,
)

_H = 3_600 * 1_000_000_000  # one hour in ns


def _events(spark, rows):
    # rows: (event_id, user_id, event_type, ts_ns, channel)
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long, ch string"
    )


def _pairs(spark, rows, lookback_ns=7 * DAY_NS):
    return touch_conversion_pairs(
        _events(spark, rows),
        "purchase",
        ["view", "click"],
        F.col("ch"),
        lookback_ns=lookback_ns,
    )


def test_three_touch_path_hand_credits(spark):
    rows = [
        (1, 7, "view", 0 * _H, "a"),
        (2, 7, "click", 1 * _H, "b"),
        (3, 7, "view", 2 * _H, "a"),
        (4, 7, "purchase", 3 * _H, None),
    ]
    credits = attribution_credits(_pairs(spark, rows), halflife_ns=_H)
    by_touch = {r["touch_id"]: r for r in credits.collect()}
    assert [by_touch[i]["rn"] for i in (1, 2, 3)] == [1, 2, 3]
    assert by_touch[1]["first_touch"] == 1.0
    assert by_touch[3]["last_touch"] == 1.0
    assert by_touch[2]["linear"] == pytest.approx(1 / 3)
    # decay weights: 2^-3, 2^-2, 2^-1 -> normalized 1/7, 2/7, 4/7
    assert by_touch[1]["time_decay"] == pytest.approx(1 / 7)
    assert by_touch[3]["time_decay"] == pytest.approx(4 / 7)
    # U-shape: 0.4 / 0.2 / 0.4
    assert by_touch[2]["position"] == pytest.approx(0.2)
    assert by_touch[1]["position"] == pytest.approx(0.4)


def test_lookback_and_strict_precedence(spark):
    rows = [
        (1, 7, "view", 0, "a"),            # exactly lookback edge: kept
        (2, 7, "view", 10 * DAY_NS, "b"),  # AFTER conversion: dropped
        (3, 7, "purchase", 7 * DAY_NS, None),
        (4, 8, "view", 7 * DAY_NS, "c"),   # same ts as conv, other user
        (5, 8, "purchase", 7 * DAY_NS, None),  # zero-touch conversion
    ]
    got = _pairs(spark, rows).collect()
    assert len(got) == 1 and got[0]["touch_id"] == 1
    # user 8: touch at == conv_ts is NOT strictly before -> no pair.


def test_degenerate_path_lengths(spark):
    rows = [
        (1, 1, "view", 0, "a"),
        (2, 1, "purchase", _H, None),      # k=1 -> position 1.0
        (3, 2, "view", 0, "a"),
        (4, 2, "click", 1, "b"),
        (5, 2, "purchase", _H, None),      # k=2 -> 0.5 each
    ]
    credits = attribution_credits(_pairs(spark, rows))
    pos = {
        (r["conv_id"], r["touch_id"]): r["position"]
        for r in credits.collect()
    }
    assert pos[(2, 1)] == 1.0
    assert pos[(5, 3)] == 0.5 and pos[(5, 4)] == 0.5


def test_every_model_sums_to_one_per_conversion(spark):
    rows = []
    eid = 0
    for u in range(5):
        for t in range(u + 1):  # paths of length 1..5
            rows.append((eid, u, "view" if t % 2 else "click", t * _H, f"c{t%2}"))
            eid += 1
        rows.append((eid, u, "purchase", 10 * _H, None))
        eid += 1
    credits = attribution_credits(_pairs(spark, rows))
    sums = credits.groupBy("conv_id").agg(
        *[
            F.sum(m).alias(m)
            for m in ("last_touch", "first_touch", "linear", "time_decay", "position")
        ]
    )
    for r in sums.collect():
        for m in ("last_touch", "first_touch", "linear", "time_decay", "position"):
            assert r[m] == pytest.approx(1.0), (r["conv_id"], m)


def test_report_totals_equal_touched_conversions(spark):
    rows = [
        (1, 1, "view", 0, "a"),
        (2, 1, "click", _H, "b"),
        (3, 1, "purchase", 2 * _H, None),
        (4, 2, "view", 0, "a"),
        (5, 2, "purchase", _H, None),
    ]
    rep = attribution_report(attribution_credits(_pairs(spark, rows)))
    total = rep.agg(
        F.sum("linear").alias("lin"), F.sum("position").alias("pos")
    ).first()
    assert total["lin"] == pytest.approx(2.0)  # two touched conversions
    assert total["pos"] == pytest.approx(2.0)
    a = {r["channel"]: r for r in rep.collect()}
    assert a["a"]["conversions"] == 2 and a["b"]["conversions"] == 1
    assert a["b"]["last_touch"] == pytest.approx(1.0)


def test_shapley_attribution_efficiency_and_symmetry(spark):
    """Shapley axioms on a constructed exposure table: (efficiency)
    the three credits sum to v(full set); (symmetry) two channels with
    identical marginal contributions get equal credit; (null player)
    a channel that never changes conversion rates gets zero."""
    from k_means_using_mapreduce_spark.operators.attribution import (
        shapley_attribution,
    )

    # users: exposure pattern -> (count, conversions)
    # design: channel A alone converts 80%, B alone 80% (symmetric),
    # C contributes nothing anywhere (null player).
    plan = {
        (1, 0, 0): (10, 8),
        (0, 1, 0): (10, 8),
        (1, 1, 0): (10, 10),
        (1, 0, 1): (10, 8),   # C added to A: same 80%
        (0, 1, 1): (10, 8),   # C added to B: same 80%
        (0, 0, 1): (10, 0),   # C alone: nothing
        (1, 1, 1): (10, 10),  # C added to AB: same 100%
        (0, 0, 0): (10, 0),
    }
    rows = []
    uid = 0
    chans = ("view", "click", "signup")
    for (a, b, c), (n, k) in plan.items():
        for i in range(n):
            uid += 1
            for bit, ch in zip((a, b, c), chans):
                if bit:
                    rows.append((uid, ch))
            if i < k:
                rows.append((uid, "purchase"))
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        r["channel"]: r
        for r in shapley_attribution(df, channels=chans).collect()
    }
    # null player: signup's marginal contribution is 0 everywhere
    assert out["signup"]["shapley"] == pytest.approx(0.0, abs=1e-12)
    # symmetry: view and click are exchangeable by construction
    assert out["view"]["shapley"] == pytest.approx(
        out["click"]["shapley"], abs=1e-12
    )
    # efficiency: credits sum to v(C) = conversion rate of the full set
    total = sum(r["shapley"] for r in out.values())
    assert total == pytest.approx(1.0, abs=1e-12)  # v(111) = 10/10
    assert out["view"]["n_exposed"] == 40  # 100, 110, 101, 111 cells


def test_shapley_attribution_guards(spark):
    from k_means_using_mapreduce_spark.operators.attribution import (
        shapley_attribution,
    )

    df = spark.createDataFrame(
        [(1, "view")], "user_id long, event_type string"
    )
    with pytest.raises(ValueError, match="3-channel"):
        shapley_attribution(df, channels=("view",))
    with pytest.raises(ValueError, match="cannot be a channel"):
        shapley_attribution(
            df,
            channels=("view", "click", "purchase"),
            conv_type="purchase",
        )


def test_markov_attribution_removal_effects_hand_chain(spark):
    """A hand-built two-path corpus: users either convert through
    view→click→purchase or touch only view and drop. Removing click
    kills every conversion (removal effect 1); removing view also
    kills everything (it gates the path); signup never appears and
    gets zero credit."""
    from k_means_using_mapreduce_spark.operators.attribution import (
        markov_attribution,
    )

    rows = []
    eid = 0
    for u in range(10):
        eid += 1
        rows.append((eid, 1_000_000_000 * eid, u, "view", 1.0))
        if u < 6:  # 6 users convert through view -> click -> purchase
            eid += 1
            rows.append((eid, 1_000_000_000 * eid, u, "click", 1.0))
            eid += 1
            rows.append((eid, 1_000_000_000 * eid, u, "purchase", 1.0))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double",
    )
    out = {
        r["channel"]: r for r in markov_attribution(df).collect()
    }
    # chain: start->view (1.0); view->click 0.6, view->null 0.4;
    # click->conv 1.0. P(conv) = 0.6.
    assert out["view"]["p_conv_full"] == pytest.approx(0.6)
    assert out["click"]["p_conv_removed"] == pytest.approx(0.0)
    assert out["view"]["p_conv_removed"] == pytest.approx(0.0)
    assert out["click"]["removal_effect"] == pytest.approx(1.0)
    assert out["view"]["removal_effect"] == pytest.approx(1.0)
    assert out["signup"]["removal_effect"] == pytest.approx(0.0)
    assert out["signup"]["credit"] == 0.0
    assert out["view"]["credit"] == pytest.approx(0.5)
    assert out["click"]["credit"] == pytest.approx(0.5)

    with pytest.raises(ValueError, match="rounds"):
        markov_attribution(df, rounds=0)
    with pytest.raises(ValueError, match="channels"):
        markov_attribution(df, channels=("purchase",))


def test_markov_attribution_path_truncates_at_first_conversion(spark):
    """Touches AFTER a user's first purchase must not count: a user
    whose path is click→purchase→signup contributes no signup
    transitions, so signup's removal changes nothing."""
    from k_means_using_mapreduce_spark.operators.attribution import (
        markov_attribution,
    )

    rows = [
        (1, 1_000_000_000, 1, "click", 1.0),
        (2, 2_000_000_000, 1, "purchase", 1.0),
        (3, 3_000_000_000, 1, "signup", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double",
    )
    out = {r["channel"]: r for r in markov_attribution(df).collect()}
    assert out["signup"]["removal_effect"] == 0.0
    assert out["click"]["removal_effect"] == pytest.approx(1.0)


def test_shapley_attribution_empty_input_raises(spark):
    """ADVICE r6: empty (or all-NULL-user) input must raise a clean
    ValueError, not TypeError on float(None)."""
    from k_means_using_mapreduce_spark.operators.attribution import (
        shapley_attribution,
    )

    empty = spark.createDataFrame(
        [], "user_id long, event_type string"
    )
    with pytest.raises(ValueError, match="at least one user"):
        shapley_attribution(
            empty, channels=("view", "click", "email")
        )
    nulls = spark.createDataFrame(
        [(None, "view")], "user_id long, event_type string"
    )
    with pytest.raises(ValueError, match="at least one user"):
        shapley_attribution(
            nulls, channels=("view", "click", "email")
        )
