"""bench.py's canary-normalized cross-round comparison (VERDICT r7
item 2): pure-function tests — no Spark, no DuckDB."""

import importlib.util
import sys
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(spec)
sys.modules.setdefault("bench", bench)
spec.loader.exec_module(bench)


def test_vs_prev_none_without_prior_canary():
    assert bench.compare_vs_prev({"a": 1.0}, {}, 0.5) is None
    assert (
        bench.compare_vs_prev({"a": 1.0}, {"queries": {"a": 1.0}}, 0.5)
        is None
    )


def test_vs_prev_host_noise_not_flagged():
    """Everything slowed 1.5× but so did the canary → zero flags."""
    prev = {
        "canary": {"scan_sec": 0.4},
        "queries": {"a": 2.0, "b": 4.0},
    }
    r = bench.compare_vs_prev({"a": 3.0, "b": 6.0}, prev, 0.6)
    assert r["host_canary_ratio"] == 1.5
    assert r["n_compared"] == 2
    assert r["flagged"] == {}


def test_vs_prev_real_regression_flagged_and_sorted():
    """Canary steady, one query 3× slower and one 2× slower → both
    flagged, worst first; a sub-threshold absolute delta is not."""
    prev = {
        "canary": {"scan_sec": 0.4},
        "queries": {"a": 2.0, "b": 1.0, "tiny": 0.2},
    }
    cur = {"a": 6.0, "b": 2.0, "tiny": 0.6}
    r = bench.compare_vs_prev(cur, prev, 0.4)
    assert list(r["flagged"]) == ["a", "b"]
    assert r["flagged"]["a"]["normalized_ratio"] == 3.0
    assert "tiny" not in r["flagged"]  # 3× but only +0.4 s absolute


def test_vs_prev_new_queries_skipped():
    prev = {"canary": {"scan_sec": 0.4}, "queries": {"a": 1.0}}
    r = bench.compare_vs_prev({"a": 1.0, "new": 9.0}, prev, 0.4)
    assert r["n_compared"] == 1
    assert r["flagged"] == {}


def test_vs_prev_zero_canary_returns_none():
    prev = {"canary": {"scan_sec": 0.4}, "queries": {"a": 1.0}}
    assert bench.compare_vs_prev({"a": 1.0}, prev, 0.0) is None
    assert (
        bench.compare_vs_prev(
            {"a": 1.0}, {"canary": {"scan_sec": 0}, "queries": {"a": 1.0}}, 0.4
        )
        is None
    )
