"""Crawler-policy operators (SURVEY.md §2.2/§2.4: P2-P6, A2/A4/A9, W3)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jivesearch_spark import crawlops


@pytest.fixture(scope="module")
def crawl_log(spark):
    rows = [
        # url, domain, crawled, status, index
        ("http://a.com/1", "a.com", dt.datetime(2026, 1, 1), 200, True),
        ("http://a.com/2", "a.com", dt.datetime(2026, 8, 1), 301, True),
        ("http://a.com/3", "a.com", None, 404, False),
        ("http://b.org/1", "b.org", dt.datetime(2025, 12, 1), 200, True),
        ("http://b.org/2", "b.org", None, 503, True),
        ("http://c.net/1", "c.net", dt.datetime(2026, 8, 10), 200, True),
    ]
    return spark.createDataFrame(
        rows, "url string, domain string, crawled timestamp, "
              "status int, index boolean")


@pytest.mark.spark
def test_recrawl_due(spark, crawl_log):
    now = F.lit(dt.datetime(2026, 8, 17)).cast("timestamp")
    got = {r.url for r in
           crawlops.recrawl_due(crawl_log, "crawled", 30, now).collect()}
    # due: never crawled, or crawled before 2026-07-18
    assert got == {"http://a.com/1", "http://a.com/3", "http://b.org/1",
                   "http://b.org/2"}


@pytest.mark.spark
def test_domain_counts_index_only(spark, crawl_log):
    got = {r.domain: r.n_docs
           for r in crawlops.domain_counts(crawl_log).collect()}
    assert got == {"a.com": 2, "b.org": 2, "c.net": 1}


@pytest.mark.spark
def test_domain_quota_deterministic(spark, crawl_log):
    got = sorted(r.url for r in crawlops.domain_quota_filter(
        crawl_log, quota=2, order_col="url").collect())
    assert got == ["http://a.com/1", "http://a.com/2", "http://b.org/1",
                   "http://b.org/2", "http://c.net/1"]


@pytest.mark.spark
def test_status_histogram(spark, crawl_log):
    got = [(r.status_class, r.n)
           for r in crawlops.status_histogram(crawl_log).collect()]
    assert got == [("2xx", 3), ("3xx", 1), ("4xx", 1), ("5xx", 1)]


@pytest.mark.spark
def test_one_per_domain(spark, crawl_log):
    got = sorted(r.url for r in
                 crawlops.one_per_domain(crawl_log).collect())
    assert got == ["http://a.com/1", "http://b.org/1", "http://c.net/1"]


@pytest.mark.spark
def test_uncrawled(spark, crawl_log):
    got = {r.url for r in crawlops.uncrawled(
        crawl_log, since=dt.datetime(2026, 1, 1)).collect()}
    assert got == {"http://a.com/1", "http://a.com/3", "http://b.org/1",
                   "http://b.org/2"}


@pytest.mark.spark
def test_nsfw_filter(spark):
    df = spark.createDataFrame(
        [("i1", 0.1), ("i2", 0.3), ("i3", 0.9)], "id string, nsfw_score double")
    assert {r.id for r in crawlops.nsfw_filter(df).collect()} == {"i1"}
    assert {r.id for r in crawlops.nsfw_filter(df, safe=False).collect()} == \
        {"i2", "i3"}


@pytest.mark.spark
def test_separate_keys_max(spark):
    df = spark.createDataFrame(
        [("porn|hentai", 0.9), ("porn", 0.4), ("neutral", 0.2)],
        "label string, score double")
    got = {r.label: r.score
           for r in crawlops.separate_keys_max(df).collect()}
    assert got == {"porn": 0.9, "hentai": 0.9, "neutral": 0.2}
