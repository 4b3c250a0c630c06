"""Property tests for the late-round-3 operators (snapshot diff, A-ES
weighted sampling, count-min sketch): each checked against a
driver-side brute-force model on random inputs."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------------------ snapshot diff

snapshot_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=30),
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
    max_size=20,
)


@SETTINGS
@given(old=snapshot_strategy, new=snapshot_strategy)
def test_snapshot_diff_equals_dict_diff(spark, old, new):
    from k_means_using_mapreduce_spark.operators.diff import snapshot_diff

    schema = "k int, v string"
    old_df = spark.createDataFrame(list(old.items()) or [(None, None)], schema)
    new_df = spark.createDataFrame(list(new.items()) or [(None, None)], schema)
    if not old:
        old_df = old_df.where("k is not null")
    if not new:
        new_df = new_df.where("k is not null")
    got = {
        r["k"]: r["change"]
        for r in snapshot_diff(
            old_df, new_df, ["k"], include_unchanged=True
        ).collect()
    }
    want = {}
    for k in set(old) | set(new):
        if k not in old:
            want[k] = "added"
        elif k not in new:
            want[k] = "removed"
        elif old[k] != new[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    assert got == want


# ---------------------------------------------------- A-ES weighted sampling

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.integers(min_value=0, max_value=200),
        st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[1],  # unique keys (snapshot semantics)
)


def _aes_priority(key: int, w: float) -> float:
    h = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
    return math.log((h + 1.0) / float(1 << 60)) / w


@SETTINGS
@given(rows=rows_strategy, k=st.integers(min_value=1, max_value=5))
def test_weighted_sample_equals_brute_force(spark, rows, k):
    from k_means_using_mapreduce_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    df = spark.createDataFrame(rows, "grp string, key int, w double")
    got = {
        (r["grp"], r["key"])
        for r in weighted_sample_per_group(df, "grp", "key", "w", k=k).collect()
    }
    want = set()
    for g in {r[0] for r in rows}:
        grp = [(kk, _aes_priority(kk, w)) for gg, kk, w in rows if gg == g]
        grp.sort(key=lambda t: (-t[1], t[0]))
        want |= {(g, kk) for kk, _ in grp[:k]}
    assert got == want


# ------------------------------------------------------------ count-min

values_strategy = st.lists(
    st.sampled_from([f"v{i}" for i in range(12)]), min_size=1, max_size=60
)


@SETTINGS
@given(values=values_strategy)
def test_count_min_matches_model_and_overcounts(spark, values):
    from k_means_using_mapreduce_spark.operators.freq import (
        build_freq_sketch,
        estimate_counts,
    )

    depth, width = 2, 16
    df = spark.createDataFrame([(v,) for v in values], "v string")
    sketch = build_freq_sketch(df, [], "v", depth=depth, width=width)

    def bucket(value: str, d: int) -> int:
        h = hashlib.md5(f"{d}:{value}".encode()).hexdigest()[:15]
        return int(h, 16) % width

    exact: dict[str, int] = {}
    for v in values:
        exact[v] = exact.get(v, 0) + 1
    model: dict[tuple[int, int], int] = {}
    for v, n in exact.items():
        for d in range(depth):
            kk = (d, bucket(v, d))
            model[kk] = model.get(kk, 0) + n
    got = {(r["d"], r["bucket"]): r["cnt"] for r in sketch.collect()}
    assert got == model

    probes = spark.createDataFrame([(v,) for v in exact], "probe string")
    est = {
        r["probe"]: r["est"]
        for r in estimate_counts(
            sketch, probes, "probe", depth=depth, width=width
        ).collect()
    }
    for v, n in exact.items():
        assert est[v] >= n
        # the model predicts the estimate exactly (deterministic hashes)
        assert est[v] == min(model[(d, bucket(v, d))] for d in range(depth))
