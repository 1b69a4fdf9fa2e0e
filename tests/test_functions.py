"""Display/scalar column functions vs reference goldens
(frontend/filters_test.go truncate table) and DuckDB cross-checks."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from jivesearch_spark import functions as jf

LONG = ("This sentence should be truncated here and not go on and on "
        "and on and more on.")


@pytest.mark.spark
def test_truncate_goldens(spark):
    df = spark.createDataFrame([(LONG,), ("This no truncate",)], "s string")
    rows = df.select(
        "s",
        jf.truncate(F.col("s"), 39, preserve=True).alias("p39"),
        jf.truncate(F.col("s"), 30, preserve=False).alias("h30"),
        jf.truncate(F.col("s"), 25, preserve=True).alias("p25"),
    ).collect()
    by_s = {r["s"]: r for r in rows}
    assert by_s[LONG]["p39"] == "This sentence should be truncated here ..."
    assert by_s[LONG]["h30"] == "This sentence should be trunca..."
    assert by_s["This no truncate"]["p25"] == "This no truncate"


@pytest.mark.spark
def test_display_functions(spark):
    df = spark.createDataFrame(
        [(1234567, 0.1234, "bob maRLey", "Claude Monet",
          "/path/to-some/file.html", "a  b a c b",
          "The Sun (a star) is  bright.")],
        "n long, ratio double, t string, img string, path string, "
        "dups string, wk string")
    r = df.select(
        jf.commafy("n").alias("c"),
        jf.percent("ratio").alias("p"),
        jf.wikipedia_canonical("t").alias("canon"),
        jf.wikimedia_image_url("img").alias("img_url"),
        jf.path_parts("path").alias("pp"),
        jf.remove_duplicate_words("dups").alias("dd"),
        jf.wiki_clean_text("wk").alias("wkc"),
        jf.strip_html(F.lit("<b>bold</b> text")).alias("sh"),
    ).collect()[0]
    assert r["c"] == "1,234,567"
    assert r["p"] == "12.34%"
    assert r["canon"] == "Bob_Marley"
    m = hashlib.md5(b"Claude_Monet").hexdigest()
    assert r["img_url"] == (
        f"https://upload.wikimedia.org/wikipedia/commons/{m[0]}/{m[:2]}/"
        "Claude_Monet")
    assert r["pp"] == "path to some file"
    assert r["dd"] == "a b c"
    assert r["wkc"] == "The Sun is  bright."
    assert r["sh"] == "bold text"


@pytest.mark.spark
def test_wiki_clean_truncate_sentence_end(spark):
    # word-preserving truncate appends " ..." unless cut ends with '.'
    df = spark.createDataFrame(
        [("A first phrase. And then much more text follows here",)],
        "s string")
    out = df.select(jf.wiki_clean_text("s", 16).alias("x")).collect()[0]["x"]
    assert out == "A first phrase."


@pytest.mark.spark
def test_dates(spark):
    df = spark.sql("SELECT timestamp'2018-02-14 15:04:05' AS ts")
    r = df.select(jf.date_basic("ts").alias("d"),
                  jf.date_minute("ts").alias("m")).collect()[0]
    assert r["d"] == "20180214" and r["m"] == "201802141504"
