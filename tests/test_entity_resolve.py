"""operators/entity.py resolve_entities + golden_records: transitive
merging, singleton identity, survivor election determinism, mixed
carry/agg survivorship."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.entity import (
    golden_records,
    resolve_entities,
)


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        (1, "acme corp", 10.0),
        (2, "acme corp.", 50.0),
        (3, "acme inc", 30.0),
        (4, "zenith llc", 5.0),
        (5, "other co", 7.0),
    ]
    return spark.createDataFrame(rows, "id long, name string, bal double")


@pytest.fixture(scope="module")
def pairs(spark):
    # 1-2 and 2-3 matched: {1,2,3} merge transitively; 4, 5 singletons
    return spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")


def test_transitive_merge_and_singletons(records, pairs):
    ent = {
        r["id"]: r["entity_id"]
        for r in resolve_entities(records, pairs, "id").collect()
    }
    assert ent == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}


def test_golden_records_mixed_policy(records, pairs):
    ent = resolve_entities(records, pairs, "id")
    joined = records.join(ent, "id")
    out = {
        r["entity_id"]: r
        for r in golden_records(
            joined,
            id_col="id",
            prefer=[("bal", "desc")],
            carry=["name"],
            agg_max=["bal"],
        ).collect()
    }
    g = out[1]
    # survivor = highest balance member (id 2); max bal across members
    assert g["survivor_id"] == 2 and g["name"] == "acme corp."
    assert g["n_members"] == 3 and g["max_bal"] == 50.0
    assert out[4]["survivor_id"] == 4 and out[4]["n_members"] == 1


def test_survivor_tie_breaks_on_id(spark):
    df = spark.createDataFrame(
        [(7, "a", 1.0, 100), (3, "b", 1.0, 100)],
        "id long, name string, bal double, entity_id long",
    )
    row = golden_records(
        df, id_col="id", prefer=[("bal", "desc")], carry=["name"]
    ).collect()[0]
    assert row["survivor_id"] == 3 and row["name"] == "b"


def test_prefer_direction_validation(records):
    df = records.withColumn("entity_id", F.col("id"))
    with pytest.raises(ValueError):
        golden_records(df, id_col="id", prefer=[("bal", "down")])


def test_empty_pairs_all_singletons(records, spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    ent = resolve_entities(records, empty, "id")
    assert all(r["id"] == r["entity_id"] for r in ent.collect())
