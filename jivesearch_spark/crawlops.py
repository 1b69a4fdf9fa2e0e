"""Crawler-side relational operators (SURVEY.md §2.2/§2.4 line items).

The reference enforces crawl policy with per-document predicates and
small aggregations scattered through the crawler and image services;
here they are plain DataFrame combinators over the pages/extracted
table so Catalyst handles pushdown and AQE handles skew:

- ``recrawl_due``        P3  `crawler.go:236-239` 30-day window
- ``domain_quota_filter``P4  `crawler.go:241-244` + count query
                             `crawler/elasticsearch.go:45-99` (10 k cap)
- ``domain_counts``      A2  `crawler/elasticsearch.go:46-71`
- ``status_histogram``   A4  `crawler/stats.go:22-26, 36-60`
- ``one_per_domain``     A5/W3 `image/elasticsearch.go:115-171`
- ``uncrawled``          P6  `image/elasticsearch.go:115-149`
- ``nsfw_filter``        P2  `image/elasticsearch.go:26-33, 50-58`
- ``separate_keys_max``  A9  `image/cmd/images.go:192-208`

All operate on columns, not rows — no Python in any of them; at
10^12-row scale each is a single shuffle (or none) with partial
aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_due(df: DataFrame, crawled_col: str = "crawled",
                since_days: int = 30, now_col=None) -> DataFrame:
    """P3: keep rows whose last crawl is older than the window (the
    reference skips urls crawled within `crawler.since` = 30 d)."""
    now = now_col if now_col is not None else F.current_timestamp()
    return df.where(F.col(crawled_col).isNull()
                    | (F.col(crawled_col) < now - F.expr(f"INTERVAL {since_days} DAYS")))


def domain_counts(df: DataFrame, domain_col: str = "domain",
                  index_col: str | None = "index") -> DataFrame:
    """A2: docs per domain (optionally only index=true docs)."""
    if index_col is not None and index_col in df.columns:
        df = df.where(F.col(index_col))
    return df.groupBy(F.col(domain_col).alias("domain")) \
             .agg(F.count(F.lit(1)).alias("n_docs"))


def domain_quota_filter(df: DataFrame, domain_col: str = "domain",
                        quota: int = 10_000,
                        order_col: str = "url") -> DataFrame:
    """P4: admit at most ``quota`` docs per domain, deterministically
    (oldest-first by ``order_col`` — the reference's arrival order).
    A window rank, not a join against a count table, so one shuffle."""
    w = Window.partitionBy(domain_col).orderBy(F.asc(order_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= quota).drop("__rn"))


def status_histogram(df: DataFrame, status_col: str = "status") -> DataFrame:
    """A4: rollup HTTP statuses to 1xx..5xx classes with counts,
    ordered by class (`crawler/stats.go:36-69` sorts class keys)."""
    cls = F.concat((F.col(status_col) / 100).cast("int").cast("string"),
                   F.lit("xx"))
    return (df.groupBy(cls.alias("status_class"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("status_class"))


def one_per_domain(df: DataFrame, domain_col: str = "domain",
                   order_col: str = "url") -> DataFrame:
    """A5/W3: the image-search 'one thumbnail per domain' bucket —
    top-hits size 1 within each domain bucket."""
    w = Window.partitionBy(domain_col).orderBy(F.asc(order_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def uncrawled(df: DataFrame, crawled_col: str = "crawled",
              since=None) -> DataFrame:
    """P6: `NOT exists(crawled) OR crawled <= since` (anti-exists OR
    range — the image recrawl candidate set)."""
    cond = F.col(crawled_col).isNull()
    if since is not None:
        cond = cond | (F.col(crawled_col) <= F.lit(since))
    return df.where(cond)


def nsfw_filter(df: DataFrame, score_col: str = "nsfw_score",
                threshold: float = 0.3, safe: bool = True) -> DataFrame:
    """P2: safe-search range predicate (< thr when safe, >= thr when
    explicitly unsafe)."""
    c = F.col(score_col)
    return df.where(c < threshold if safe else c >= threshold)


def separate_keys_max(df: DataFrame, key_col: str = "label",
                      score_col: str = "score", sep: str = "|") -> DataFrame:
    """A9: classifier labels arrive as multi-keys ('a|b'); split,
    explode, keep the max score per single key."""
    return (df.select(F.explode(F.split(F.col(key_col), "\\" + sep)).alias("label"),
                      F.col(score_col))
            .groupBy("label").agg(F.max(score_col).alias("score")))
