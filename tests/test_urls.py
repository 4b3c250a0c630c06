"""URL canonicalization edge cases (functions/urls.py): hostless and
NULL inputs, ports, www, tracking params, param sorting, fragments,
two-level public suffixes, slash normalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.functions.urls import (
    canonical_url,
    registered_domain,
    url_host,
    url_path,
    url_query_canonical,
)


def _one(spark, url, expr):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(expr("url").alias("v")).first()["v"]


def test_host_normalization(spark):
    assert _one(spark, "HTTP://WWW.Ex.COM:8080/a", url_host) == "ex.com"
    assert _one(spark, "https://ex.com/a", url_host) == "ex.com"
    assert _one(spark, "not-a-url", url_host) == ""
    assert _one(spark, "/relative/path", url_host) == ""


def test_path_normalization(spark):
    assert _one(spark, "https://e.com", url_path) == "/"
    assert _one(spark, "https://e.com/", url_path) == "/"
    assert _one(spark, "https://e.com//a///b//", url_path) == "/a/b"
    assert _one(spark, "https://e.com/a/b?x=1#f", url_path) == "/a/b"


def test_query_canonical(spark):
    assert (
        _one(spark, "https://e.com/?b=2&utm_source=x&a=1#frag", url_query_canonical)
        == "a=1&b=2"
    )
    assert _one(spark, "https://e.com/?gclid=z&ref=home", url_query_canonical) == ""
    assert _one(spark, "https://e.com/a", url_query_canonical) == ""
    # empty segments from && or trailing & are dropped
    assert _one(spark, "https://e.com/?a=1&&b=2&", url_query_canonical) == "a=1&b=2"


def test_canonical_url_collapses_variants(spark):
    variants = [
        "HTTP://WWW.Ex.COM:80/p//3/?utm_source=x&id=7&b=2#top",
        "https://ex.com/p/3?b=2&id=7",
        "https://www.ex.com/p/3/?id=7&b=2&gclid=zz",
        "http://ex.com:8080/p/3?id=7&b=2",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    out = {r["c"] for r in df.select(canonical_url("url").alias("c")).collect()}
    assert out == {"https://ex.com/p/3?b=2&id=7"}


def test_canonical_null_cases(spark):
    df = spark.createDataFrame([(None,), ("no-scheme/path",)], "url string")
    vals = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    assert vals == [None, None]


def test_registered_domain(spark):
    assert _one(spark, "https://a.b.example.co.uk/x", registered_domain) == "example.co.uk"
    assert _one(spark, "https://sub.example.com/x", registered_domain) == "example.com"
    assert _one(spark, "https://example.com/x", registered_domain) == "example.com"
    assert _one(spark, "https://localhost/x", registered_domain) == "localhost"
    # co.uk with only two labels is itself the registrable candidate
    assert _one(spark, "https://co.uk/", registered_domain) == "co.uk"
    assert _one(spark, "relative", registered_domain) is None
