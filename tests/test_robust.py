"""operators/robust.py + sampling.cap_per_group: MAD semantics,
winsorization, cap determinism under repartitioning, plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.robust import (
    mad_outlier_stats,
    winsorized_mean,
)
from k_means_using_mapreduce_spark.operators.sampling import cap_per_group
from k_means_using_mapreduce_spark.plans.explain import (
    broadcast_join_count,
    sort_merge_join_count,
)


@pytest.fixture(scope="module")
def vals(spark):
    # group a: tight cluster around 10 with one wild outlier
    rows = [("a", v) for v in [9.0, 10.0, 10.0, 10.0, 11.0, 1000.0]]
    # group b: all identical -> mad == 0 degenerate case
    rows += [("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 7.0)]
    return spark.createDataFrame(rows, "g string, x double")


def test_mad_flags_the_outlier(vals):
    out = {r["g"]: r for r in mad_outlier_stats(vals, "x", ["g"]).collect()}
    a = out["a"]
    assert a["median"] == 10.0 and a["mad"] == 0.5
    assert a["n_outliers"] == 1 and a["n"] == 6  # only the 1000.0
    assert a["outlier_frac"] == pytest.approx(1 / 6)


def test_mad_zero_degenerate_group(vals):
    out = {r["g"]: r for r in mad_outlier_stats(vals, "x", ["g"]).collect()}
    b = out["b"]
    assert b["mad"] == 0.0
    assert b["n_outliers"] == 1  # any deviation from the median flags


def test_winsorized_mean_clamps_tails(spark):
    rows = [("a", float(v)) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = winsorized_mean(df, "x", ["g"], lower=0.05, upper=0.95).collect()[0]
    assert out["lo"] == pytest.approx(5.95)
    assert out["hi"] == pytest.approx(95.05)
    # clamping is symmetric here, so the mean stays 50.5
    assert out["wmean"] == pytest.approx(50.5)
    assert out["n"] == 100


def test_validation(vals):
    with pytest.raises(ValueError):
        mad_outlier_stats(vals, "x", ["g"], k=0)
    with pytest.raises(ValueError):
        winsorized_mean(vals, "x", ["g"], lower=0.9, upper=0.1)
    with pytest.raises(ValueError):
        cap_per_group(vals, "g", "x", n=0)


def test_cap_per_group_deterministic_under_repartition(spark):
    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {
        (r["source"], r["doc_id"])
        for r in cap_per_group(df, "source", "doc_id", n=7).collect()
    }
    b = {
        (r["source"], r["doc_id"])
        for r in cap_per_group(
            df.repartition(13), "source", "doc_id", n=7
        ).collect()
    }
    assert a == b and len(a) == 21


def test_cap_per_group_small_groups_intact(spark):
    df = spark.createDataFrame([(1, "s"), (2, "s")], "doc_id long, source string")
    assert cap_per_group(df, "source", "doc_id", n=10).count() == 2


def test_mad_plan_broadcasts_group_stats(spark, sf_oracle):
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    out = mad_outlier_stats(li, "l_extendedprice", ["l_returnflag"])
    out.collect()
    assert broadcast_join_count(out) >= 2  # median + stats joins
    assert sort_merge_join_count(out) == 0


def test_percentile_rank_filter_keeps_upper_quartiles(spark):
    from k_means_using_mapreduce_spark.operators.robust import (
        percentile_rank_filter,
    )

    rows = [("en", float(v)) for v in range(1, 6)]  # ranks 0,.25,.5,.75,1
    rows += [("fr", 9.0)]  # singleton group: percent_rank 0, always kept
    df = spark.createDataFrame(rows, "lang string, q double")
    out = percentile_rank_filter(df, "q", ["lang"], min_pct=0.5)
    got = sorted((r["lang"], r["q"]) for r in out.collect())
    assert got == [("en", 3.0), ("en", 4.0), ("en", 5.0), ("fr", 9.0)]
    # ties are kept or dropped together
    tied = spark.createDataFrame(
        [("en", 1.0), ("en", 2.0), ("en", 2.0)], "lang string, q double"
    )
    kept = percentile_rank_filter(tied, "q", ["lang"], min_pct=0.5)
    assert kept.count() == 2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        percentile_rank_filter(df, "q", ["lang"], min_pct=1.5)


def test_group_linear_fit_exact_line_and_degenerate(spark):
    from k_means_using_mapreduce_spark.operators.robust import group_linear_fit

    rows = [("a", float(x), 2.0 * x + 3.0) for x in range(10)]  # perfect line
    rows += [("b", 1.0, 5.0), ("b", 1.0, 9.0)]  # constant x -> NULL fit
    rows += [("c", 1.0, 4.0), ("c", 2.0, 4.0)]  # constant y -> r2 NULL
    rows += [("a", None, 1.0), ("a", 1.0, None)]  # nulls excluded
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in group_linear_fit(df, "x", "y", ["g"]).collect()}
    a = out["a"]
    assert a["n"] == 10
    assert a["slope"] == pytest.approx(2.0)
    assert a["intercept"] == pytest.approx(3.0)
    assert a["r2"] == pytest.approx(1.0)
    assert out["b"]["slope"] is None and out["b"]["r2"] is None
    c = out["c"]
    assert c["slope"] == pytest.approx(0.0) and c["r2"] is None


# -------------------------------------------------------------- Benford


def test_benford_digit_extraction_and_boundaries(spark):
    from k_means_using_mapreduce_spark.operators.robust import (
        benford_digit_distribution,
    )

    df = spark.createDataFrame(
        [(1.0,), (100.00,), (99.99,), (0.01,), (923.5,), (0.0,), (-5.0,), (None,)],
        "v double",
    )
    out = {r["digit"]: r for r in benford_digit_distribution(df, "v", scale=100).collect()}
    # digits: 1.00->1, 100.00->1, 99.99->9, 0.01->1, 923.5->9
    assert out[1]["n"] == 3
    assert out[9]["n"] == 2
    assert sum(r["n"] for r in out.values()) == 5  # 0 / negative / null excluded
    assert len(out) == 9  # zero-filled digits present
    assert out[2]["n"] == 0 and out[2]["chi2_term"] > 0


def test_benford_log_uniform_fits(spark):
    import math
    import random

    from k_means_using_mapreduce_spark.operators.robust import (
        benford_digit_distribution,
    )

    rng = random.Random(9)
    vals = [(10 ** rng.uniform(0, 4),) for _ in range(4000)]
    df = spark.createDataFrame(vals, "v double")
    rows = benford_digit_distribution(df, "v", scale=100).collect()
    chi2 = sum(r["chi2_term"] for r in rows)
    assert chi2 < 30  # log-uniform data obeys Benford (8 dof, loose)
    for r in rows:
        assert r["expected_p"] == pytest.approx(
            math.log10(1 + 1 / r["digit"])
        )


def test_concentration_perfect_equality(spark):
    from k_means_using_mapreduce_spark.operators.robust import (
        concentration_stats,
    )

    # 10 keys with equal mass: gini = 0, hhi = 1/10, top1 = 1/10
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(10)], "k int, v double"
    )
    r = concentration_stats(df, "k", "v", top_k=3).collect()[0]
    assert r["n_keys"] == 10
    assert r["gini"] == pytest.approx(0.0, abs=1e-12)
    assert r["hhi"] == pytest.approx(0.1)
    assert r["top1_share"] == pytest.approx(0.1)
    assert r["top3_share"] == pytest.approx(0.3)


def test_concentration_total_monopoly(spark):
    from k_means_using_mapreduce_spark.operators.robust import (
        concentration_stats,
    )

    # one key holds everything: gini -> (n-1)/n, hhi = 1, top1 = 1
    df = spark.createDataFrame(
        [(0, 100.0)] + [(i, 0.0) for i in range(1, 5)], "k int, v double"
    )
    r = concentration_stats(df, "k", "v").collect()[0]
    assert r["gini"] == pytest.approx(4.0 / 5.0)
    assert r["hhi"] == pytest.approx(1.0)
    assert r["top1_share"] == pytest.approx(1.0)


def test_concentration_grouped_and_aggregates_keys(spark):
    from k_means_using_mapreduce_spark.operators.robust import (
        concentration_stats,
    )

    # key 1 in group a appears twice -> totals 3.0; grouping by g
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 1, 2.0), ("a", 2, 3.0),
         ("b", 1, 4.0), ("b", 2, 4.0)],
        "g string, k int, v double",
    )
    out = {
        r["g"]: r
        for r in concentration_stats(df, "k", "v", by=["g"]).collect()
    }
    assert out["a"]["n_keys"] == 2
    assert out["a"]["hhi"] == pytest.approx((9.0 + 9.0) / 36.0)
    assert out["b"]["gini"] == pytest.approx(0.0, abs=1e-12)


def test_concentration_zero_mass_is_null_not_error(spark):
    from k_means_using_mapreduce_spark.operators.robust import (
        concentration_stats,
    )

    df = spark.createDataFrame([(1, 0.0), (2, 0.0)], "k int, v double")
    r = concentration_stats(df, "k", "v").collect()[0]
    assert r["gini"] is None and r["hhi"] is None


def test_tail_index_recovers_pareto_alpha(spark):
    from k_means_using_mapreduce_spark.operators.robust import tail_index

    # exact Pareto(alpha=2) inverse-CDF grid: x = u^(-1/2)
    rows = [((i + 0.5) / 4000.0,) for i in range(4000)]
    df = spark.createDataFrame(
        [(u ** -0.5,) for (u,) in rows], "v double"
    )
    r = tail_index(df, "v", tail_q=0.9).collect()[0]
    assert r["alpha"] == pytest.approx(2.0, rel=0.1)
    assert r["n_tail"] > 300
    assert r["xmin"] > 0


def test_tail_index_nonpositive_tail_is_empty(spark):
    from k_means_using_mapreduce_spark.operators.robust import tail_index

    df = spark.createDataFrame([(-5.0,), (-1.0,), (0.0,)], "v double")
    r = tail_index(df, "v").collect()[0]
    assert r["n_tail"] == 0 and r["alpha"] is None
    with pytest.raises(ValueError):
        tail_index(df, "v", tail_q=1.0)


def test_mahalanobis_flags_joint_outlier(spark):
    from k_means_using_mapreduce_spark.operators.robust import (
        mahalanobis_summary,
    )

    # tight line y = x plus one point far OFF the line but inside both
    # margins — the case per-column z-scores miss
    rows = [(float(i), float(i) + 0.01 * ((i * 7) % 5 - 2)) for i in range(50)]
    rows.append((25.0, 45.0))
    df = spark.createDataFrame(rows, "x double, y double")
    r = mahalanobis_summary(df, "x", "y").collect()[0]
    assert r["n"] == 51
    assert r["n_outliers"] >= 1
    assert r["max_d2"] > 20.0  # the off-line point, even after masking
    # trace identity: avg d2 over the FIT SAMPLE is exactly
    # 2·(n-1)/n for sample covariance — the outlier redistributes
    # mass but the average is pinned
    assert r["avg_d2"] == pytest.approx(2.0 * 50 / 51, rel=1e-6)


def test_mahalanobis_guards(spark):
    import pytest as _p

    from k_means_using_mapreduce_spark.operators.robust import (
        mahalanobis_summary,
    )

    two = spark.createDataFrame([(1.0, 2.0), (2.0, 3.0)], "x double, y double")
    with _p.raises(ValueError, match="at least 3"):
        mahalanobis_summary(two, "x", "y")
    col = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)], "x double, y double"
    )
    with _p.raises(ValueError, match="singular"):
        mahalanobis_summary(col, "x", "y")
    with _p.raises(ValueError, match="threshold"):
        mahalanobis_summary(col, "x", "y", threshold=0.0)


def test_weighted_percentile_hand_case(spark):
    from k_means_using_mapreduce_spark.operators.robust import (
        weighted_percentile,
    )

    # values 1..4 with weights 1,1,1,7: weighted median must be 4
    # (cum weights 1,2,3,10; 0.5*10=5 first reached at v=4),
    # row-median would be 2.5
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0)],
        "v double, w double",
    )
    r = weighted_percentile(df, "v", "w", [0.25, 0.5]).collect()[0]
    assert r["total_weight"] == pytest.approx(10.0)
    assert r["p_0_25"] == 3.0  # 2.5 reached at cum 3
    assert r["p_0_5"] == 4.0


def test_weighted_percentile_uniform_weights_and_guards(spark):
    from k_means_using_mapreduce_spark.operators.robust import (
        weighted_percentile,
    )

    # unit weights: q=1.0 returns the max; zero/negative weights drop
    df = spark.createDataFrame(
        [(float(i), 1.0) for i in range(1, 11)] + [(99.0, 0.0), (98.0, -1.0)],
        "v double, w double",
    )
    r = weighted_percentile(df, "v", "w", [1.0]).collect()[0]
    assert r["p_1_0"] == 10.0
    import pytest as _p

    with _p.raises(ValueError):
        weighted_percentile(df, "v", "w", [])
    with _p.raises(ValueError):
        weighted_percentile(df, "v", "w", [0.0])


def test_gumbel_recovers_parameters_from_gumbel_grid(spark):
    import math

    from k_means_using_mapreduce_spark.operators.robust import (
        gumbel_block_maxima,
    )

    # inverse-CDF Gumbel(mu=10, beta=2) grid as "block maxima"
    mu, beta = 10.0, 2.0
    rows = [
        (i, mu - beta * math.log(-math.log((i + 0.5) / 400.0)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "block int, value double")
    r = gumbel_block_maxima(df, "value", "block", return_period=100.0).collect()[0]
    assert r["n_blocks"] == 400
    assert r["mu"] == pytest.approx(mu, abs=0.3)
    assert r["beta"] == pytest.approx(beta, abs=0.2)
    # 1-in-100 return level exceeds the 99th-percentile-ish region
    assert r["return_level"] > mu + 3.0 * beta
    import pytest as _p

    with _p.raises(ValueError):
        gumbel_block_maxima(df, "value", "block", return_period=1.0)


def test_gumbel_degenerate_is_null(spark):
    from k_means_using_mapreduce_spark.operators.robust import (
        gumbel_block_maxima,
    )

    # identical maxima in every block: sd nullified, params NULL
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0)], "block int, value double"
    )
    r = gumbel_block_maxima(df, "value", "block").collect()[0]
    assert r["beta"] is None and r["return_level"] is None


def test_theil_equality_and_monopoly(spark):
    import math

    from k_means_using_mapreduce_spark.operators.robust import theil_index

    eq = spark.createDataFrame([(i, 5.0) for i in range(8)], "k int, v double")
    r = theil_index(eq, "k", "v").collect()[0]
    assert r["theil"] == pytest.approx(0.0, abs=1e-12)
    assert r["theil_max"] == pytest.approx(math.log(8.0))

    mono = spark.createDataFrame(
        [(0, 80.0)] + [(i, 0.0) for i in range(1, 8)], "k int, v double"
    )
    r2 = theil_index(mono, "k", "v").collect()[0]
    # total monopoly reaches the ln(n) ceiling exactly
    assert r2["theil"] == pytest.approx(math.log(8.0))


def test_theil_grouped(spark):
    from k_means_using_mapreduce_spark.operators.robust import theil_index

    rows = [("a", 1, 10.0), ("a", 2, 10.0), ("b", 1, 30.0), ("b", 2, 10.0)]
    df = spark.createDataFrame(rows, "g string, k int, v double")
    out = {r["g"]: r for r in theil_index(df, "k", "v", by=["g"]).collect()}
    assert out["a"]["theil"] == pytest.approx(0.0, abs=1e-12)
    assert out["b"]["theil"] > 0.05


class TestBracketPercentiles:
    """exact_group_percentiles(method='bracket') must equal the
    whole-group-buffer exact aggregate on ANY input — including heavy
    duplicates, tiny groups, singletons, null values, null group keys,
    and accuracies small enough to force real bracketing."""

    def _check(self, spark, rows, ps, accuracy):
        from k_means_using_mapreduce_spark.operators.robust import (
            exact_group_percentiles,
        )

        df = spark.createDataFrame(rows, "g string, v double")
        got = {
            tuple(r[0:1]) + (r["n"],) + tuple(r[2:])
            for r in exact_group_percentiles(
                df, "v", ["g"], ps, accuracy=accuracy
            ).collect()
        }
        want = {
            tuple(r[0:1]) + (r["n"],) + tuple(r[2:])
            for r in exact_group_percentiles(
                df, "v", ["g"], ps, method="buffered"
            ).collect()
        }
        import math

        def canon(s):
            return {
                tuple(
                    round(x, 12) if isinstance(x, float) and not math.isnan(x) else x
                    for x in t
                )
                for t in s
            }

        assert canon(got) == canon(want)

    def test_random_heavy_dups_small_accuracy(self, spark):
        import random

        rng = random.Random(7)
        rows = []
        for g in ["a", "b", "c"]:
            n = rng.choice([1, 2, 3, 50, 400])
            for _ in range(n):
                # heavy duplicate mass around a few values
                rows.append((g, float(rng.choice([1, 1, 1, 2, 5, 5, 9, rng.random() * 10]))))
        ps = [("p05", 0.05), ("p50", 0.5), ("p95", 0.95), ("p0", 0.0), ("p1", 1.0)]
        # accuracy=64 forces genuine bracketing on the 400-row group
        self._check(spark, rows, ps, accuracy=64)

    def test_all_equal_and_null_group(self, spark):
        rows = [("x", 3.0)] * 200 + [(None, 1.0), (None, 2.0), ("y", 7.0)]
        self._check(spark, rows, [("med", 0.5), ("q9", 0.9)], accuracy=32)

    def test_null_values_ignored(self, spark):
        rows = [("g", float(i)) for i in range(100)] + [("g", None)] * 10
        self._check(spark, rows, [("med", 0.5)], accuracy=16)

    def test_winsorized_and_mad_bracket_match_buffered(self, spark, sf_small):
        from k_means_using_mapreduce_spark.operators.robust import (
            mad_outlier_stats,
            winsorized_mean,
        )

        li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
        for fn in (
            lambda m: winsorized_mean(li, "l_extendedprice", ["l_returnflag"], method=m),
            lambda m: mad_outlier_stats(li, "l_extendedprice", ["l_returnflag"], method=m),
        ):
            a = {tuple(r) for r in fn("bracket").collect()}
            b = {tuple(r) for r in fn("buffered").collect()}
            assert a == b


class TestHBOS:
    def test_modal_row_scores_zero_and_outlier_ranks_top(self, spark):
        from k_means_using_mapreduce_spark.operators.robust import hbos_scores

        rows = [(i, 5.0, 10.0) for i in range(1, 40)] + [(99, 100.0, -50.0)]
        df = spark.createDataFrame(rows, "id long, a double, b double")
        got = {r["id"]: r["hbos"] for r in hbos_scores(df, ["a", "b"], "id", bins=8).collect()}
        assert got[1] == pytest.approx(0.0)  # modal bins in both columns
        import math

        assert got[99] == pytest.approx(2 * math.log(39.0))

    def test_nulls_and_constant_column_contribute_zero(self, spark):
        from k_means_using_mapreduce_spark.operators.robust import hbos_scores

        rows = [(1, None, 7.0), (2, 3.0, 7.0), (3, 4.0, 7.0)]
        df = spark.createDataFrame(rows, "id long, a double, b double")
        got = {r["id"]: r["hbos"] for r in hbos_scores(df, ["a", "b"], "id", bins=4).collect()}
        # b is constant -> all rows share its single bin (0 term);
        # row 1's null a contributes 0; rows 2/3 land in distinct a-bins
        # of count 1 each with max 1 -> 0 surprise too
        assert all(v == pytest.approx(0.0) for v in got.values())
        assert len(got) == 3


class TestEBShrinkage:
    def test_small_groups_shrink_harder(self, spark):
        from k_means_using_mapreduce_spark.operators.robust import (
            eb_shrunk_means,
        )

        import random

        rng = random.Random(3)
        rows = []
        # big group centered 10, big group centered 20, tiny lucky group
        for _ in range(200):
            rows.append(("big10", 10.0 + rng.uniform(-1, 1)))
            rows.append(("big20", 20.0 + rng.uniform(-1, 1)))
        rows += [("tiny", 30.0), ("tiny", 31.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {r["g"]: r for r in eb_shrunk_means(df, "v", ["g"]).collect()}
        # big groups barely move, tiny shrinks visibly toward the grand
        assert abs(got["big10"]["mean_shrunk"] - got["big10"]["mean_raw"]) < 0.1
        assert got["tiny"]["shrink_b"] < got["big10"]["shrink_b"]
        grand = (10.0 * 0 + sum(r[1] for r in rows)) / len(rows)
        raw, shrunk = got["tiny"]["mean_raw"], got["tiny"]["mean_shrunk"]
        assert abs(shrunk - grand) < abs(raw - grand)

    def test_exchangeable_groups_collapse_to_grand(self, spark):
        from k_means_using_mapreduce_spark.operators.robust import (
            eb_shrunk_means,
        )

        # identical distributions: tau^2 clamps to 0 -> everyone at grand
        rows = [(g, float(i % 5)) for g in "abcd" for i in range(50)]
        df = spark.createDataFrame(rows, "g string, v double")
        got = eb_shrunk_means(df, "v", ["g"]).collect()
        grand = 2.0
        assert all(r["mean_shrunk"] == pytest.approx(grand) for r in got)
        assert all(r["shrink_b"] == pytest.approx(0.0) for r in got)


def test_exact_group_percentiles_survives_caller_n_column(spark):
    """Regression (ADVICE r5): a caller column literally named `n`
    (resample_counts grids) used to make the internal count reference
    ambiguous and blow up group_median/winsorized wrappers."""
    from k_means_using_mapreduce_spark.operators.robust import (
        exact_group_percentiles,
        group_median,
    )

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 12)],
        "key string, n int, v double",
    )
    r = exact_group_percentiles(
        df, "v", ["key"], [("p50", 0.5)]
    ).collect()[0]
    assert r["n"] == 11 and r["p50"] == 6.0
    m = group_median(df, "v", ["key"]).collect()[0]
    assert m["median"] == 6.0


def test_ransac_recovers_planted_line_under_gross_outliers(spark):
    """y = 3x + 2 exactly for 80% of rows plus 20% gross outliers:
    the consensus vote finds the true line (inliers = the clean 80%),
    the refit lands on (2, 3) exactly, and plain OLS on the same data
    would not (the outliers drag it) — the whole point of RANSAC."""
    from k_means_using_mapreduce_spark.operators.robust import ransac_line
    from pyspark.sql import functions as F

    rows = []
    for i in range(100):
        x = float(i % 25)
        if i % 5 == 0:  # 20% gross outliers, far off the line
            rows.append((i, x, 3.0 * x + 2.0 + 500.0 + 7.0 * (i % 3)))
        else:
            rows.append((i, x, 3.0 * x + 2.0))
    df = spark.createDataFrame(rows, "id long, x double, y double")
    r = ransac_line(
        df, "x", "y", F.col("id"), seeds=8, eps=0.5
    ).collect()[0]
    assert r["n"] == 100
    assert r["n_inliers"] == 80
    assert r["a"] == pytest.approx(2.0, abs=1e-9)
    assert r["b"] == pytest.approx(3.0, abs=1e-9)
    assert r["rmse_inliers"] == pytest.approx(0.0, abs=1e-6)
    # the candidate 2-point line is already on the plane
    assert r["a0"] == pytest.approx(2.0, abs=1e-9)
    assert r["b0"] == pytest.approx(3.0, abs=1e-9)


def test_ransac_determinism_and_guards(spark):
    from k_means_using_mapreduce_spark.operators.robust import ransac_line
    from pyspark.sql import functions as F

    rows = [(i, float(i), 2.0 * i + 1.0) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    r1 = ransac_line(df, "x", "y", F.col("id"), seeds=4, eps=1.0)
    r2 = ransac_line(df, "x", "y", F.col("id"), seeds=4, eps=1.0)
    assert r1.collect() == r2.collect()  # md5 draws, no rand()

    with pytest.raises(ValueError, match="seeds"):
        ransac_line(df, "x", "y", F.col("id"), seeds=0)
    with pytest.raises(ValueError, match="eps"):
        ransac_line(df, "x", "y", F.col("id"), eps=0.0)
    # all x equal -> every pair vertical -> no candidate
    dfv = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 1.0, 2.0)], "id long, x double, y double"
    )
    with pytest.raises(ValueError, match="vertical"):
        ransac_line(dfv, "x", "y", F.col("id"))


def test_boxcox_picks_log_for_lognormal_and_identity_for_normalish(spark):
    """Deterministic lognormal-ish data (exp of a symmetric grid)
    maximizes the profile likelihood at lambda = 0 (log); data already
    symmetric picks lambda = 1 (identity). Guards raise."""
    import math

    from k_means_using_mapreduce_spark.operators.robust import (
        boxcox_profile,
    )

    logn = spark.createDataFrame(
        [(math.exp((i % 21 - 10) / 4.0),) for i in range(420)],
        "v double",
    )
    out = {r["lam"]: r for r in boxcox_profile(logn, "v").collect()}
    assert len(out) == 5
    best = [lam for lam, r in out.items() if r["is_best"]]
    assert best == [0.0]

    # LEFT-skewed data wants lambda > 1; on this ladder the top rung
    # (identity) wins — the opposite pull from the lognormal case
    left = spark.createDataFrame(
        [(100.0 - math.exp((i % 21 - 10) / 4.0),) for i in range(420)],
        "v double",
    )
    best = [
        r["lam"] for r in boxcox_profile(left, "v").collect() if r["is_best"]
    ]
    assert best == [1.0]
    sym = left

    with pytest.raises(ValueError, match="distinct"):
        boxcox_profile(sym, "v", lambdas=(0.0, 0.0))
    with pytest.raises(ValueError, match=">= 2"):
        boxcox_profile(sym, "v", lambdas=(1.0,))
