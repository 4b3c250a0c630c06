"""operators/clseval.py: hand-computed confusion/PRF1/kappa/MCC on a
known matrix, zero-division conventions, invented-class handling, and
perfect/inverted edge cases."""

from __future__ import annotations

import math

import pytest

from k_means_using_mapreduce_spark.operators.clseval import (
    class_metrics,
    classification_summary,
    confusion_matrix,
)


@pytest.fixture(scope="module")
def labeled(spark):
    # confusion matrix (gold rows x pred cols), classes a/b:
    #        pred a  pred b
    # gold a   4       1
    # gold b   2       3
    rows = (
        [("a", "a")] * 4
        + [("a", "b")] * 1
        + [("b", "a")] * 2
        + [("b", "b")] * 3
    )
    return spark.createDataFrame(rows, "label string, pred string")


def test_confusion_cells(labeled):
    cells = {
        (r["label"], r["pred"]): r["n"]
        for r in confusion_matrix(labeled, "label", "pred").collect()
    }
    assert cells == {("a", "a"): 4, ("a", "b"): 1, ("b", "a"): 2, ("b", "b"): 3}


def test_class_metrics_hand_computed(labeled):
    out = {
        r["class"]: r
        for r in class_metrics(labeled, "label", "pred").collect()
    }
    a, b = out["a"], out["b"]
    assert (a["n_gold"], a["n_pred"], a["tp"]) == (5, 6, 4)
    assert a["precision"] == pytest.approx(4 / 6)
    assert a["recall"] == pytest.approx(4 / 5)
    assert a["f1"] == pytest.approx(2 * (4 / 6) * (4 / 5) / (4 / 6 + 4 / 5))
    assert b["precision"] == pytest.approx(3 / 4)
    assert b["recall"] == pytest.approx(3 / 5)


def test_summary_kappa_mcc_hand_computed(labeled):
    row = classification_summary(labeled, "label", "pred").collect()[0]
    assert row["n"] == 10
    assert row["accuracy"] == pytest.approx(0.7)
    # pe = (5*6 + 5*4) / 100 = 0.5 → kappa = (0.7-0.5)/0.5 = 0.4
    assert row["kappa"] == pytest.approx(0.4)
    # binary MCC = (4*3 - 1*2)/sqrt(6*4*5*5) = 10/sqrt(600)
    assert row["mcc"] == pytest.approx(10.0 / math.sqrt(600.0))
    assert row["macro_f1"] == pytest.approx(
        (2 * (4 / 6) * (4 / 5) / (4 / 6 + 4 / 5)
         + 2 * (3 / 4) * (3 / 5) / (3 / 4 + 3 / 5)) / 2
    )


def test_invented_class_conventions(spark):
    # model predicts class 'c' that never appears in gold: its
    # precision is 0 (zero_division), it has no recall support, and it
    # must NOT dilute macro averages
    df = spark.createDataFrame(
        [("a", "a"), ("a", "c"), ("b", "b")], "label string, pred string"
    )
    out = {r["class"]: r for r in class_metrics(df, "label", "pred").collect()}
    assert out["c"]["n_gold"] == 0 and out["c"]["n_pred"] == 1
    assert out["c"]["precision"] == 0.0 and out["c"]["recall"] == 0.0
    summ = classification_summary(df, "label", "pred").collect()[0]
    # macro over gold classes a (p=1, r=1/2, f1=2/3) and b (1,1,1) only
    assert summ["macro_recall"] == pytest.approx((0.5 + 1.0) / 2)
    assert summ["macro_f1"] == pytest.approx((2 / 3 + 1.0) / 2)


def test_perfect_classifier(spark):
    df = spark.createDataFrame(
        [(c, c) for c in "aabbcc"], "label string, pred string"
    )
    row = classification_summary(df, "label", "pred").collect()[0]
    for c in ("accuracy", "kappa", "mcc", "macro_f1", "weighted_f1"):
        assert row[c] == pytest.approx(1.0), c


def test_degenerate_single_class_kappa_null(spark):
    # gold and pred both constant: po = pe = 1 → kappa 0/0 → NULL,
    # mcc denominator 0 → NULL (not a crash under ANSI mode)
    df = spark.createDataFrame(
        [("a", "a")] * 3, "label string, pred string"
    )
    row = classification_summary(df, "label", "pred").collect()[0]
    assert row["accuracy"] == 1.0
    assert row["kappa"] is None and row["mcc"] is None


def _nb_corpus(spark, n=60):
    # two cleanly separable vocabularies; doc_id drives the hash split
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, "aaa bbb aaa ccc", "x"))
        else:
            rows.append((i, "zzz yyy zzz www", "y"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_naive_bayes_separable_corpus_is_diagonal(spark):
    from k_means_using_mapreduce_spark.operators.classifier import (
        naive_bayes_confusion,
    )

    out = naive_bayes_confusion(
        _nb_corpus(spark), "lang", test_pct=20
    ).collect()
    # perfectly separable vocab: only diagonal confusion cells appear
    assert out, "holdout must be non-empty"
    for r in out:
        assert r["label"] == r["pred_label"]
    assert sum(r["n_docs"] for r in out) > 0


def test_naive_bayes_empty_text_falls_back_to_prior(spark):
    from k_means_using_mapreduce_spark.operators.classifier import (
        naive_bayes_confusion,
    )

    # majority class "x" 3:1 in train; the token-less test doc must be
    # predicted as the larger-prior class
    rows = [(i, "aaa bbb", "x") for i in range(100, 160)]
    rows += [(i, "zzz yyy", "y") for i in range(160, 180)]
    rows.append((7, "", "y"))  # doc_id 7 hashes into the test bucket?
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from k_means_using_mapreduce_spark.operators.sampling import hash_bucket
    from pyspark.sql import functions as F

    bucket = (
        df.where(F.col("doc_id") == 7)
        .select(hash_bucket("doc_id", 100).alias("b"))
        .collect()[0]["b"]
    )
    out = naive_bayes_confusion(df, "lang", test_pct=20).collect()
    if bucket < 20:  # doc 7 is in the holdout: prior-only argmax -> x
        cells = {(r["label"], r["pred_label"]): r["n_docs"] for r in out}
        assert any(k == ("y", "x") for k in cells), cells


def test_naive_bayes_rejects_bad_args(spark):
    import pytest as _pytest

    from k_means_using_mapreduce_spark.operators.classifier import (
        naive_bayes_confusion,
    )

    df = _nb_corpus(spark, n=4)
    with _pytest.raises(ValueError):
        naive_bayes_confusion(df, "lang", test_pct=0)
    with _pytest.raises(ValueError):
        naive_bayes_confusion(df, "lang", alpha=0.0)


def test_auc_perfect_and_reverse_and_random(spark):
    from k_means_using_mapreduce_spark.operators.clseval import (
        binary_rank_metrics,
    )

    # perfectly separating score
    perfect = spark.createDataFrame(
        [(float(i), 1.0 if i >= 5 else 0.0) for i in range(10)],
        "s double, y double",
    )
    r = binary_rank_metrics(perfect, "s", "y").collect()[0]
    assert r["auc"] == pytest.approx(1.0)
    assert r["ks"] == pytest.approx(1.0)
    assert (r["n_pos"], r["n_neg"]) == (5, 5)

    # anti-separating score
    rev = spark.createDataFrame(
        [(float(i), 0.0 if i >= 5 else 1.0) for i in range(10)],
        "s double, y double",
    )
    assert binary_rank_metrics(rev, "s", "y").collect()[0][
        "auc"
    ] == pytest.approx(0.0)

    # constant score: all one tie block, AUC = 0.5 by midranks
    const = spark.createDataFrame(
        [(1.0, float(i % 2)) for i in range(8)], "s double, y double"
    )
    assert binary_rank_metrics(const, "s", "y").collect()[0][
        "auc"
    ] == pytest.approx(0.5)


def test_auc_matches_sklearn_formula_with_ties(spark):
    from k_means_using_mapreduce_spark.operators.clseval import (
        binary_rank_metrics,
    )

    # hand-computable tied case: scores [1,1,2,3,3,3], y [0,1,0,1,0,1]
    data = [(1.0, 0.0), (1.0, 1.0), (2.0, 0.0),
            (3.0, 1.0), (3.0, 0.0), (3.0, 1.0)]
    df = spark.createDataFrame(data, "s double, y double")
    r = binary_rank_metrics(df, "s", "y").collect()[0]
    # midranks: block1 -> 1.5, block2 -> 3, block3 -> 5
    # pos_rank_sum = 1.5 + 5 + 5 = 11.5; auc = (11.5 - 6) / 9
    assert r["auc"] == pytest.approx((11.5 - 6.0) / 9.0)


def test_auc_single_class_is_null(spark):
    from k_means_using_mapreduce_spark.operators.clseval import (
        binary_rank_metrics,
    )

    df = spark.createDataFrame(
        [(float(i), 1.0) for i in range(4)], "s double, y double"
    )
    r = binary_rank_metrics(df, "s", "y").collect()[0]
    assert r["auc"] is None and r["ks"] is None


def test_auc_rejects_nonbinary_label(spark):
    from k_means_using_mapreduce_spark.operators.clseval import (
        binary_rank_metrics,
    )
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(1.0, 2.0)], "s double, y double")
    with pytest.raises(Exception, match="label must be 0/1"):
        binary_rank_metrics(df, "s", "y").collect()


def test_decile_lift_perfect_ranking(spark):
    from k_means_using_mapreduce_spark.operators.clseval import decile_lift

    # 100 rows, top 10 scores are exactly the positives
    rows = [(i, float(100 - i), 1.0 if i < 10 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s double, y double")
    out = {r["tile"]: r for r in decile_lift(df, "s", "y", id_col="id").collect()}
    assert len(out) == 10
    assert out[1]["n_pos"] == 10
    assert out[1]["lift"] == pytest.approx(10.0)
    assert out[1]["cum_capture"] == pytest.approx(1.0)
    assert out[10]["n_pos"] == 0
    assert out[10]["cum_capture"] == pytest.approx(1.0)
    # every tile equal size
    assert all(r["n"] == 10 for r in out.values())


def test_decile_lift_no_positives_null_lift(spark):
    from k_means_using_mapreduce_spark.operators.clseval import decile_lift

    df = spark.createDataFrame(
        [(i, float(i), 0.0) for i in range(20)], "id long, s double, y double"
    )
    out = decile_lift(df, "s", "y", id_col="id", bins=4).collect()
    assert all(r["lift"] is None for r in out)
    import pytest as _p

    with _p.raises(ValueError):
        decile_lift(df, "s", "y", bins=1)


def test_clustering_agreement_properties(spark):
    from k_means_using_mapreduce_spark.operators.clseval import (
        clustering_agreement,
    )

    rows = [(i, i % 3, (2 - i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, a int, b int")
    r = clustering_agreement(df, "a", "b").collect()[0]
    # relabeled-identical partitions: perfect agreement
    assert r["ari"] == pytest.approx(1.0) and r["nmi"] == pytest.approx(1.0)

    # refinement: b splits each a-cluster in two -> partial agreement
    rows2 = [(i, i % 2, i % 4) for i in range(80)]
    r2 = clustering_agreement(
        spark.createDataFrame(rows2, "id long, a int, b int"), "a", "b"
    ).collect()[0]
    assert 0.0 < r2["ari"] < 1.0 and 0.0 < r2["nmi"] < 1.0

    # constant labeling: NULL nmi (no entropy to normalize by)
    rows3 = [(i, 1, i % 2) for i in range(10)]
    r3 = clustering_agreement(
        spark.createDataFrame(rows3, "id long, a int, b int"), "a", "b"
    ).collect()[0]
    assert r3["nmi"] is None and r3["ari"] == pytest.approx(0.0)
