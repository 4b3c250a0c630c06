"""functions/text.py readability: hand-computed Flesch values,
sentence floor, empty-text NULL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.functions.text import (
    flesch_reading_ease,
    sentence_count,
    syllable_estimate,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(col("t").alias("x")).first()["x"]


def test_syllable_vowel_groups(spark):
    # "beautiful" -> eau, i, u = 3 groups; "sky" -> y = 1
    assert _one(spark, "beautiful", syllable_estimate) == 3
    assert _one(spark, "sky", syllable_estimate) == 1
    assert _one(spark, "zzz", syllable_estimate) == 0


def test_sentence_floor(spark):
    assert _one(spark, "no punctuation here", sentence_count) == 1
    assert _one(spark, "One. Two! Three?", sentence_count) == 3
    assert _one(spark, "Wait... what?!", sentence_count) == 2


def test_flesch_hand_value(spark):
    # "the cat sat." : words=3, sentences=1, syllables=3
    # 206.835 - 1.015*3 - 84.6*1 = 119.19
    got = _one(spark, "the cat sat.", flesch_reading_ease)
    assert got == pytest.approx(206.835 - 1.015 * 3 - 84.6 * 1.0)


def test_flesch_null_on_empty(spark):
    assert _one(spark, "   ", flesch_reading_ease) is None


def test_harder_text_scores_lower(spark):
    easy = _one(spark, "the dog ran. the dog sat. we like it.", flesch_reading_ease)
    hard = _one(
        spark,
        "notwithstanding institutional heterogeneity considerations "
        "epistemological ramifications predominate.",
        flesch_reading_ease,
    )
    assert easy > hard
