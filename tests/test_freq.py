"""Count-min sketch invariants: deterministic overcount, exact
mergeability, bounded size, and md5-parity with a driver-side Python
recomputation of the same hash family."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.freq import (
    build_freq_sketch,
    estimate_counts,
    rollup_freq,
)

DEPTH, WIDTH = 3, 64


def py_bucket(value: str, d: int, width: int) -> int:
    h = hashlib.md5(f"{d}:{value}".encode()).hexdigest()[:15]
    return int(h, 16) % width


@pytest.fixture(scope="module")
def tokens(spark):
    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(40)]
    # zipf-ish counts so some values are heavy hitters
    rows = [(v,) for i, v in enumerate(vocab) for _ in range(1 + 200 // (i + 1))]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "token string").cache()


def exact_counts(tokens) -> dict[str, int]:
    return {
        r["token"]: r["n"]
        for r in tokens.groupBy("token").agg(F.count("*").alias("n")).collect()
    }


def test_estimates_only_overcount(spark, tokens):
    sketch = build_freq_sketch(tokens, [], "token", depth=DEPTH, width=WIDTH)
    exact = exact_counts(tokens)
    probes = spark.createDataFrame(
        [(t,) for t in exact] + [("absent",)], "probe string"
    )
    est = {
        r["probe"]: r["est"]
        for r in estimate_counts(
            sketch, probes, "probe", depth=DEPTH, width=WIDTH
        ).collect()
    }
    for t, n in exact.items():
        assert est[t] >= n, f"count-min undercounted {t}"
    # absent value: overcount only via collisions in ALL depths
    collides_everywhere = all(
        any(
            py_bucket("absent", d, WIDTH) == py_bucket(t, d, WIDTH)
            for t in exact
        )
        for d in range(DEPTH)
    )
    if not collides_everywhere:
        assert est["absent"] == 0


def test_collision_free_depth_is_exact(spark, tokens):
    # with the real vocab and a wide enough sketch, verify from Python
    # that at least one depth hashes all values injectively — then the
    # min over depths must equal the exact count for EVERY value
    width = 4096
    exact = exact_counts(tokens)
    assert any(
        len({py_bucket(t, d, width) for t in exact}) == len(exact)
        for d in range(DEPTH)
    ), "test precondition: widen the sketch"
    sketch = build_freq_sketch(tokens, [], "token", depth=DEPTH, width=width)
    probes = spark.createDataFrame([(t,) for t in exact], "probe string")
    est = {
        r["probe"]: r["est"]
        for r in estimate_counts(
            sketch, probes, "probe", depth=DEPTH, width=width
        ).collect()
    }
    assert est == exact


def test_sketch_matches_python_recomputation(tokens):
    sketch = build_freq_sketch(tokens, [], "token", depth=DEPTH, width=WIDTH)
    got = {
        (r["d"], r["bucket"]): r["cnt"] for r in sketch.collect()
    }
    want: dict[tuple[int, int], int] = {}
    for t, n in exact_counts(tokens).items():
        for d in range(DEPTH):
            k = (d, py_bucket(t, d, WIDTH))
            want[k] = want.get(k, 0) + n
    assert got == want


def test_merge_equals_single_pass(tokens):
    a = tokens.where(F.length("token") <= 4)
    b = tokens.where(F.length("token") > 4)
    merged = rollup_freq(
        build_freq_sketch(a, [], "token", depth=DEPTH, width=WIDTH).unionByName(
            build_freq_sketch(b, [], "token", depth=DEPTH, width=WIDTH)
        ),
        [],
    )
    single = build_freq_sketch(tokens, [], "token", depth=DEPTH, width=WIDTH)
    as_map = lambda df: {  # noqa: E731
        (r["d"], r["bucket"]): r["cnt"] for r in df.collect()
    }
    assert as_map(merged) == as_map(single)


def test_grouped_rollup_and_size_bound(spark, tokens):
    grouped = tokens.withColumn(
        "grp", (F.length("token") % 2).cast("int")
    )
    sk = build_freq_sketch(grouped, ["grp"], "token", depth=DEPTH, width=WIDTH)
    per_group = sk.groupBy("grp").count().collect()
    for r in per_group:
        assert r["count"] <= DEPTH * WIDTH
    # rolling the grouped sketch up to global == building global directly
    global_direct = build_freq_sketch(tokens, [], "token", depth=DEPTH, width=WIDTH)
    as_map = lambda df: {  # noqa: E731
        (r["d"], r["bucket"]): r["cnt"] for r in df.collect()
    }
    assert as_map(rollup_freq(sk, [])) == as_map(global_direct)


def test_null_values_skipped(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "token string")
    sk = build_freq_sketch(df, [], "token", depth=1, width=8)
    assert sum(r["cnt"] for r in sk.collect()) == 2


def test_shape_validation(spark, tokens):
    with pytest.raises(ValueError):
        build_freq_sketch(tokens, [], "token", depth=0, width=8)
    with pytest.raises(ValueError):
        build_freq_sketch(tokens, [], "token", depth=2, width=1)


def test_sketch_from_preaggregated_counts(spark):
    """A persisted histogram feeds the sketch builder directly and
    yields the identical sketch an occurrence-level build would."""
    from k_means_using_mapreduce_spark.operators.freq import (
        sketch_from_counts,
    )

    occurrences = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)], "token string"
    )
    hist = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1)], "token string, n long"
    )
    direct = build_freq_sketch(occurrences, [], "token", depth=DEPTH, width=WIDTH)
    from_hist = sketch_from_counts(
        hist, [], value_col="token", cnt_col="n", depth=DEPTH, width=WIDTH
    )
    as_map = lambda df: {  # noqa: E731
        (r["d"], r["bucket"]): r["cnt"] for r in df.collect()
    }
    assert as_map(from_hist) == as_map(direct)


def test_grouped_estimates_match_model(spark):
    """Per-(group, probe) estimates equal the python hash model,
    including zero for groups where a probe never occurs."""
    from k_means_using_mapreduce_spark.operators.freq import (
        estimate_counts_grouped,
    )

    import pytest as _pt

    rows = (
        [("s1", "x")] * 4
        + [("s1", "y")] * 2
        + [("s2", "y")] * 7
        + [("s2", "z")]
    )
    df = spark.createDataFrame(rows, "src string, token string")
    sk = build_freq_sketch(df, ["src"], "token", depth=DEPTH, width=WIDTH)
    probes = spark.createDataFrame(
        [("x",), ("y",), ("absent",)], "probe string"
    )
    got = {
        (r["src"], r["probe"]): r["est"]
        for r in estimate_counts_grouped(
            sk, ["src"], probes, "probe", depth=DEPTH, width=WIDTH
        ).collect()
    }
    exact = {("s1", "x"): 4, ("s1", "y"): 2, ("s2", "y"): 7, ("s2", "z"): 1}
    model: dict[tuple[str, int, int], int] = {}
    for (src, tok), n in exact.items():
        for d in range(DEPTH):
            k = (src, d, py_bucket(tok, d, WIDTH))
            model[k] = model.get(k, 0) + n
    for src in ("s1", "s2"):
        for probe in ("x", "y", "absent"):
            want = min(
                model.get((src, d, py_bucket(probe, d, WIDTH)), 0)
                for d in range(DEPTH)
            )
            assert got[(src, probe)] == want
    assert set(got) == {(s, p) for s in ("s1", "s2") for p in ("x", "y", "absent")}

    with _pt.raises(ValueError, match="group_cols"):
        estimate_counts_grouped(sk, [], probes, "probe")


def test_estimate_counts_rejects_grouped_sketch(spark, tokens):
    """A grouped sketch joined on (d, bucket) alone mixes counters
    across groups and min() can UNDERCOUNT — the guard turns that
    silent wrong answer into a ValueError (round-3 advice)."""
    grouped = build_freq_sketch(
        tokens.withColumn("grp", F.lit("a")),
        ["grp"],
        "token",
        depth=DEPTH,
        width=WIDTH,
    )
    probes = spark.createDataFrame([("tok0",)], "probe string")
    with pytest.raises(ValueError, match="GLOBAL sketch"):
        estimate_counts(grouped, probes, "probe", depth=DEPTH, width=WIDTH)
    # rollup_freq to [] is the documented bridge back to the global form
    est = estimate_counts(
        rollup_freq(grouped, []), probes, "probe", depth=DEPTH, width=WIDTH
    )
    assert est.count() == 1


def test_join_size_estimate_overcounts_only(spark):
    """est >= exact always; with a wide sketch (few collisions) the
    estimate is exact."""
    from k_means_using_mapreduce_spark.operators.freq import (
        build_freq_sketch,
        estimate_join_size,
    )

    a = spark.createDataFrame([(i % 7,) for i in range(50)], "k long")
    b = spark.createDataFrame([(i % 5,) for i in range(30)], "k long")
    exact = a.join(b, "k").count()
    wide_a = build_freq_sketch(a, [], "k", depth=3, width=4096)
    wide_b = build_freq_sketch(b, [], "k", depth=3, width=4096)
    assert estimate_join_size(wide_a, wide_b).first()["est"] == exact
    tight_a = build_freq_sketch(a, [], "k", depth=2, width=4)
    tight_b = build_freq_sketch(b, [], "k", depth=2, width=4)
    assert estimate_join_size(tight_a, tight_b).first()["est"] >= exact
    grouped = build_freq_sketch(
        a.withColumn("g", F.lit("x")), ["g"], "k", depth=2, width=4
    )
    with pytest.raises(ValueError, match="GLOBAL sketches"):
        estimate_join_size(grouped, tight_b)
