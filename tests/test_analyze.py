"""Cross-engine analyzer identity: Spark, pure Python, and DuckDB must
produce identical token lists — the foundation of both rank-identity
and the DuckDB correctness oracles.
"""

import duckdb
import pytest

from jivesearch_spark import analyze

SAMPLES = [
    "The title of a page",
    "Bob Dylan!  bob-dylan  BOB_DYLAN",
    "café menú — naïve",     # non-ascii letters are separators (pinned)
    "a1b2c3 42 x",
    "",
    "   ",
    "UPPER lower MiXeD",
    "comma,separated,words",
    "東京 ページ english words",
]


def test_python_tokens():
    assert analyze.py_tokens("The title of a page") == ["the", "title", "of", "a", "page"]
    assert analyze.py_tokens("Bob-Dylan_42") == ["bob", "dylan", "42"]
    assert analyze.py_tokens("") == []


def test_bigrams_python():
    assert analyze.py_bigrams(["a", "b", "c"]) == ["a b", "b c"]
    assert analyze.py_bigrams(["a"]) == []


def test_duckdb_matches_python():
    con = duckdb.connect()
    for s in SAMPLES:
        got = con.execute(
            f"SELECT {analyze.sql_tokens('?')}", [s]).fetchone()[0]
        assert list(got) == analyze.py_tokens(s), s


@pytest.mark.spark
def test_spark_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    rows = df.select(analyze.tokens("s").alias("t")).collect()
    for s, r in zip(SAMPLES, rows):
        assert list(r.t) == analyze.py_tokens(s), s


@pytest.mark.spark
def test_spark_bigrams_match_python(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    rows = df.select(analyze.bigrams(analyze.tokens("s")).alias("b")).collect()
    for s, r in zip(SAMPLES, rows):
        assert list(r.b) == analyze.py_bigrams(analyze.py_tokens(s)), s
