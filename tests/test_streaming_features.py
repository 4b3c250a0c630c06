"""Streaming decayed features (streaming/features.py): cross-batch
exponential-state composition equals the one-shot batch operator,
replay no-op, late batches, empty batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.timeseries import decayed_aggregate
from k_means_using_mapreduce_spark.streaming.features import DecayedFeatureSink

HL = 2_000_000  # 2 s half-life (µs)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "user_id int, ts long, value double")


def _feats(sink):
    return {
        r["user_id"]: (r["decayed_sum"], r["decayed_n"], r["asof_us"])
        for r in sink.features().collect()
    }


def test_batches_compose_to_batch_operator(spark, tmp_path):
    rows = [
        (1, 1_000_000_000, 2.0),
        (1, 3_000_000_000, 4.0),
        (2, 2_000_000_000, 1.0),
        (1, 6_000_000_000, 8.0),
        (2, 7_000_000_000, 3.0),
    ]
    sink = DecayedFeatureSink(
        spark, str(tmp_path / "s"), ["user_id"], "value", "ts", half_life_us=HL
    )
    sink(_rows(spark, rows[:3]), 0)
    sink(_rows(spark, rows[3:]), 1)
    got = _feats(sink)

    final_asof = 7_000_000  # µs of the max event
    want = {
        r["user_id"]: (r["decayed_sum"], r["decayed_n"])
        for r in decayed_aggregate(
            _rows(spark, rows),
            ["user_id"],
            "value",
            "ts",
            half_life_us=HL,
            asof_us=final_asof,
        ).collect()
    }
    assert set(got) == set(want)
    for u, (s, n) in want.items():
        assert got[u][0] == pytest.approx(s, rel=1e-12)
        assert got[u][1] == pytest.approx(n, rel=1e-12)
        assert got[u][2] == final_asof


def test_replay_is_noop_and_mean_derived(spark, tmp_path):
    sink = DecayedFeatureSink(
        spark, str(tmp_path / "s"), ["user_id"], "value", "ts", half_life_us=HL
    )
    b = _rows(spark, [(1, 1_000_000_000, 6.0)])
    sink(b, 0)
    sink(b, 0)  # replay
    got = _feats(sink)
    assert got[1][0] == pytest.approx(6.0)
    assert sink.features().first()["decayed_mean"] == pytest.approx(6.0)


def test_late_batch_decays_into_current_frame(spark, tmp_path):
    sink = DecayedFeatureSink(
        spark, str(tmp_path / "s"), ["user_id"], "value", "ts", half_life_us=HL
    )
    sink(_rows(spark, [(1, 10_000_000_000, 5.0)]), 0)  # asof 10s
    # late batch: all events older; asof must NOT rewind
    sink(_rows(spark, [(1, 8_000_000_000, 4.0)]), 1)
    got = _feats(sink)
    assert got[1][2] == 10_000_000
    assert got[1][0] == pytest.approx(5.0 + 4.0 * 0.5)  # 2 s old at 2 s HL


def test_empty_batch_keeps_state(spark, tmp_path):
    sink = DecayedFeatureSink(
        spark, str(tmp_path / "s"), ["user_id"], "value", "ts", half_life_us=HL
    )
    sink(_rows(spark, [(1, 1_000_000_000, 2.0)]), 0)
    sink(_rows(spark, []), 1)
    assert _feats(sink)[1][0] == pytest.approx(2.0)


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="group_cols"):
        DecayedFeatureSink(spark, str(tmp_path / "x"), [], "v", "ts", half_life_us=HL)
    with pytest.raises(ValueError, match="half_life"):
        DecayedFeatureSink(
            spark, str(tmp_path / "y"), ["u"], "v", "ts", half_life_us=0
        )


def test_empty_first_batch_keeps_real_group_types(spark, tmp_path):
    """An empty FIRST batch must seed a 0-row state with the group
    columns' real types so later batches union cleanly."""
    sink = DecayedFeatureSink(
        spark, str(tmp_path / "s"), ["user_id"], "value", "ts", half_life_us=HL
    )
    sink(_rows(spark, []), 0)
    sink(_rows(spark, [(7, 1_000_000_000, 2.5)]), 1)
    got = _feats(sink)
    assert got[7][0] == pytest.approx(2.5)


def test_streaming_end_to_end(spark, tmp_path):
    import json

    d = tmp_path / "in"
    d.mkdir()
    with open(d / "b0.json", "w") as fh:
        for i in range(10):
            fh.write(
                json.dumps(
                    {"user_id": i % 2, "ts": (i + 1) * 1_000_000_000, "value": float(i)}
                )
                + "\n"
            )
    sink = DecayedFeatureSink(
        spark, str(tmp_path / "state"), ["user_id"], "value", "ts", half_life_us=HL
    )
    src = spark.readStream.schema("user_id int, ts long, value double").json(str(d))
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _feats(sink)
    assert set(got) == {0, 1}
    assert got[0][2] == 10_000_000  # asof advanced to the max event µs
