"""timeseries.growth_accounting: hand-built two-period ledger, the
net-change identity, and phantom-churn horizon cut."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.timeseries import (
    growth_accounting,
)

_B = 100  # tiny bucket for readability


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts long, value double")


def test_hand_ledger(spark):
    rows = [
        (1, 10, 50.0),            # u1: 50 -> 80  (expansion +30)
        (1, 110, 80.0),
        (2, 20, 40.0),            # u2: 40 -> 10  (contraction -30)
        (2, 120, 10.0),
        (3, 30, 25.0),            # u3: churns (25 -> 0)
        (4, 130, 60.0),           # u4: new in period 2
    ]
    out = {
        r["bucket_ns"]: r
        for r in growth_accounting(_ev(spark, rows), bucket_ns=_B).collect()
    }
    p1, p2 = out[0], out[100]
    assert p1["active_users"] == 3 and p1["new_rev"] == pytest.approx(115.0)
    assert p2["active_users"] == 3
    assert p2["new_rev"] == pytest.approx(60.0)
    assert p2["expansion"] == pytest.approx(30.0)
    assert p2["contraction"] == pytest.approx(30.0)
    assert p2["churned_rev"] == pytest.approx(25.0)
    assert p2["net_change"] == pytest.approx(
        p2["total_rev"] - p1["total_rev"]
    )
    # horizon: no phantom bucket 200 made of pure churn
    assert set(out) == {0, 100}


def test_resurrection_counts_as_new(spark):
    rows = [(1, 10, 5.0), (1, 210, 7.0), (2, 110, 1.0), (2, 210, 1.0)]
    out = {
        r["bucket_ns"]: r
        for r in growth_accounting(_ev(spark, rows), bucket_ns=_B).collect()
    }
    # u1 skipped period 100 -> churned there, new again at 200.
    assert out[100]["churned_rev"] == pytest.approx(5.0)
    assert out[200]["new_rev"] == pytest.approx(7.0)
    assert out[200]["expansion"] == pytest.approx(0.0)


def test_identity_on_many_periods(spark):
    rows = []
    for u in range(6):
        for t in range(5):
            if (u + t) % 3 != 0:
                rows.append((u, t * _B + u, float((u + 1) * (t + 1))))
    out = growth_accounting(_ev(spark, rows), bucket_ns=_B).collect()
    for r in out:
        assert r["net_change"] == pytest.approx(
            r["new_rev"] + r["expansion"] - r["contraction"] - r["churned_rev"]
        )
    with pytest.raises(ValueError):
        growth_accounting(_ev(spark, rows), bucket_ns=0)
