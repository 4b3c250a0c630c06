"""operators/graph.py::hits: hand-checked hub/authority separation,
normalization, weights, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.graph import hits


def _scores(spark, rows, **kw):
    df = spark.createDataFrame(rows, "src string, dst string")
    return {r["node"]: (r["hub"], r["auth"]) for r in hits(df, **kw).collect()}


def test_star_separates_hubs_from_authorities(spark):
    # h1, h2, h3 all point at 'a': a is the pure authority, h* pure hubs
    s = _scores(spark, [("h1", "a"), ("h2", "a"), ("h3", "a")])
    assert s["a"][1] == pytest.approx(1.0)  # all authority mass
    assert s["a"][0] == pytest.approx(0.0)  # no hub mass
    for h in ("h1", "h2", "h3"):
        assert s[h][0] == pytest.approx(1 / 3)
        assert s[h][1] == pytest.approx(0.0)


def test_l1_normalized_each_side(spark):
    s = _scores(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    assert sum(v[0] for v in s.values()) == pytest.approx(1.0)
    assert sum(v[1] for v in s.values()) == pytest.approx(1.0)


def test_weights_shift_authority(spark):
    rows = [("u", "big", 10.0), ("u", "small", 1.0)]
    df = spark.createDataFrame(rows, "src string, dst string, w double")
    s = {r["node"]: r["auth"] for r in hits(df, weight_col="w").collect()}
    assert s["big"] > s["small"] * 5


def test_deterministic(spark):
    rows = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")]
    df = spark.createDataFrame(rows, "src string, dst string")
    one = sorted(map(tuple, hits(df, max_iter=4).collect()))
    two = sorted(map(tuple, hits(df, max_iter=4).collect()))
    assert one == two


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        hits(df, max_iter=0)
    with pytest.raises(ValueError):
        hits(df.where(F.lit(False)))
