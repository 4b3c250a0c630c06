"""Property tests for the sketch and PQ families: merge identities on
random partitions of random data, span detection vs a brute-force
substring model, ADC score structure."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------- sketch merge identities ----------------

values_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # bucket
        st.integers(min_value=0, max_value=200),  # value
    ),
    min_size=1,
    max_size=120,
)


@SETTINGS
@given(rows=values_strategy)
def test_hll_union_of_any_partition_equals_global(spark, rows):
    """Merging per-bucket sketches must estimate exactly what one
    sketch over the concatenation estimates — for ANY bucketing."""
    from k_means_using_mapreduce_spark.operators.sketch import (
        build_distinct_sketches,
        rollup_distinct,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "b long, v long")
    merged = rollup_distinct(build_distinct_sketches(df, ["b"], "v"), []).first()
    direct = build_distinct_sketches(
        df.withColumn("one", F.lit(1)), ["one"], "v"
    ).first()
    assert merged["distinct_est"] == direct["distinct_est"]
    assert merged["n_rows"] == len(rows)


@SETTINGS
@given(rows=values_strategy)
def test_kll_merge_of_any_partition_equals_global(spark, rows):
    from k_means_using_mapreduce_spark.operators.sketch import (
        build_quantile_sketches,
        rollup_quantiles,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "b long, v long")
    merged = rollup_quantiles(
        build_quantile_sketches(df, ["b"], "v"), [], quantiles=(0.5,)
    ).first()
    direct = rollup_quantiles(
        build_quantile_sketches(df.withColumn("one", F.lit(1)), ["one"], "v"),
        [],
        quantiles=(0.5,),
    ).first()
    # k=200 with <=120 values: both sketches are exact and identical
    assert merged["p50"] == direct["p50"]
    exact = sorted(v for _, v in rows)
    # KLL p50 at full precision is an element of the data
    assert merged["p50"] in [float(v) for v in exact]


@SETTINGS
@given(rows=values_strategy)
def test_theta_retention_exact_below_nominal(spark, rows):
    """Theta sketches are EXACT below 2^lg_k entries, so on small data
    the retention estimates must equal true set arithmetic."""
    from k_means_using_mapreduce_spark.operators.sketch import (
        bucket_retention,
        build_theta_sketches,
    )

    df = spark.createDataFrame(rows, "b long, v long")
    got = {
        r["b"]: r for r in bucket_retention(
            build_theta_sketches(df, ["b"], "v"), "b"
        ).collect()
    }
    sets: dict[int, set] = {}
    for b, v in rows:
        sets.setdefault(b, set()).add(v)
    order = sorted(sets)
    for prev_b, cur_b in zip(order, order[1:]):
        p, c = sets[prev_b], sets[cur_b]
        assert got[cur_b]["retained_est"] == len(c & p)
        assert got[cur_b]["churned_est"] == len(p - c)
        assert got[cur_b]["new_est"] == len(c - p)
    assert got[order[0]]["retained_est"] is None


# ---------------- duplicate spans: stride=1 exact guarantee ----------------

texts_strategy = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=40), min_size=2, max_size=6
)


@SETTINGS
@given(texts=texts_strategy, gram_len=st.integers(min_value=2, max_value=5))
def test_spans_stride1_matches_brute_force_grams(spark, texts, gram_len):
    """With stride=1, a position is inside a reported span iff it is
    covered by some L-gram occurring in >= 2 distinct documents —
    Lee et al.'s exact guarantee, checked against a brute-force model."""
    from k_means_using_mapreduce_spark.operators.spans import duplicate_spans

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in duplicate_spans(
        df, gram_len=gram_len, stride=1, min_docs=2
    ).collect():
        cov = got.setdefault(r["id"], set())
        cov.update(range(r["span_start"], r["span_end"]))

    # brute force: gram -> set of docs; duplicated grams cover positions
    from collections import defaultdict

    where = defaultdict(set)
    for i, t in rows:
        for p in range(len(t) - gram_len + 1):
            where[t[p : p + gram_len]].add(i)
    expect: dict[int, set] = {}
    for i, t in rows:
        cov = set()
        for p in range(len(t) - gram_len + 1):
            if len(where[t[p : p + gram_len]]) >= 2:
                cov.update(range(p, p + gram_len))
        if cov:
            expect[i] = cov
    assert got == expect


# ---------------- PQ/ADC structure ----------------


@SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-4, max_value=4, allow_nan=False, allow_infinity=False
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=4,
        max_size=24,
    )
)
def test_pq_encode_matches_numpy_argmin(spark, vecs):
    """Codes from the Arrow kernel equal a driver-side numpy argmin for
    arbitrary data and codebooks derived from it."""
    import numpy as np

    from k_means_using_mapreduce_spark.operators.pq import (
        encode_pq,
        train_pq_codebooks,
    )

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = train_pq_codebooks(
        df, m=2, n_codes=min(4, len(vecs)), seed=3, max_iter=3
    )
    got = {
        r["vec_id"]: list(r["codes"]) for r in encode_pq(df, books).collect()
    }
    C = np.asarray(books)
    for i, v in rows:
        x = np.asarray(v)
        for j in range(2):
            s = x[j * 4 : (j + 1) * 4]
            d = ((C[j] - s[None, :]) ** 2).sum(axis=1)
            assert got[i][j] == int(d.argmin())
