"""IvmRollupSink (streaming/ivm_sink.py): maintained rollup equals
recompute across batches, replay is a no-op (the accumulating-merge
case the replay guard exists for), zero-count groups leave, and the
availableNow end-to-end path."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.streaming.ivm_sink import IvmRollupSink


def _b(spark, rows):
    return spark.createDataFrame(rows, "g string, v double, op string")


def _state(sink):
    return {
        r["g"]: (r["n"], r["sum_v"]) for r in sink.current().collect()
    }


def test_maintained_rollup_across_batches(spark, tmp_path):
    sink = IvmRollupSink(spark, str(tmp_path / "s"), ["g"], "v")
    sink(_b(spark, [("a", 1.0, "i"), ("a", 2.0, "i"), ("b", 5.0, "i")]), 0)
    assert _state(sink) == {"a": (2, 3.0), "b": (1, 5.0)}
    sink(_b(spark, [("a", 1.0, "d"), ("b", 5.0, "d"), ("c", 4.0, "i")]), 1)
    # b emptied -> gone; a loses one row; c appears
    assert _state(sink) == {"a": (1, 2.0), "c": (1, 4.0)}


def test_replay_does_not_double_apply(spark, tmp_path):
    sink = IvmRollupSink(spark, str(tmp_path / "s"), ["g"], "v")
    batch = _b(spark, [("a", 1.0, "i")])
    sink(batch, 0)
    sink(batch, 0)  # replay: accumulating merge MUST be guarded
    assert _state(sink) == {"a": (1, 1.0)}


def test_initial_batch_with_orphan_deletes(spark, tmp_path):
    sink = IvmRollupSink(spark, str(tmp_path / "s"), ["g"], "v")
    sink(_b(spark, [("a", 1.0, "i"), ("z", 9.0, "d")]), 0)
    assert _state(sink) == {"a": (1, 1.0)}  # orphan delete dropped


def test_streaming_end_to_end_available_now(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    with open(d / "b0.json", "w") as fh:
        for i in range(8):
            fh.write(
                json.dumps(
                    {"g": "even" if i % 2 == 0 else "odd",
                     "v": float(i), "op": "i"}
                )
                + "\n"
            )
    sink = IvmRollupSink(spark, str(tmp_path / "s"), ["g"], "v")
    src = spark.readStream.schema("g string, v double, op string").json(str(d))
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _state(sink) == {"even": (4, 12.0), "odd": (4, 16.0)}
