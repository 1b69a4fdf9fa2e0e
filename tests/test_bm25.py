"""Rank-identity: Spark brute-force BM25 (single-field and fielded) vs
the pure-Python oracle on the synthetic corpus — docids identical,
scores to 1e-6, for the whole reference query set (FIXTURES.md §3).
"""

import pytest

from jivesearch_spark import bm25, corpus, oracle
from jivesearch_spark.extract import extract_page
from jivesearch_spark.queries import QUERY_SET

N_DOCS = 600


@pytest.fixture(scope="module")
def corpus_rows():
    return [corpus.gen_page(i) for i in range(N_DOCS)]


@pytest.fixture(scope="module")
def extracted(corpus_rows):
    docs = {}
    for url, ts, html, text, lang in corpus_rows:
        d = extract_page(url, html)
        docs[d.url] = {
            "title": d.title, "keywords": d.keywords,
            "description": d.description, "domain": d.domain,
            "path_parts": d.path_parts, "tld": d.tld,
            "index": d.index and d.canonical, "lang": d.lang,
            "text": d.text,
        }
    return docs


@pytest.fixture(scope="module")
def spark_docs(spark, extracted):
    rows = [
        (u, v["title"], v["keywords"], v["description"], v["domain"],
         v["path_parts"], v["tld"], v["index"], v["lang"], v["text"])
        for u, v in sorted(extracted.items())
    ]
    df = spark.createDataFrame(
        rows,
        "url string, title string, keywords string, description string, "
        "domain string, path_parts string, tld string, index boolean, "
        "lang string, text string",
    ).cache()
    df.count()
    return df


def _assert_rank_identical(got, want, ctx=""):
    assert len(got) == len(want), f"{ctx}: {len(got)} vs {len(want)} rows\n{got}\n{want}"
    for i, ((gd, gs), (wd, ws)) in enumerate(zip(got, want)):
        assert gd == wd, f"{ctx} rank {i}: doc {gd} != {wd}"
        assert abs(gs - ws) < 1e-6, f"{ctx} rank {i}: score {gs} != {ws}"


@pytest.mark.spark
def test_single_field_matches_oracle(spark, spark_docs, extracted):
    indexed = {u: v["text"] for u, v in extracted.items() if v["index"]}
    ora = oracle.SingleFieldIndex(indexed)
    base = spark_docs.where("index").selectExpr("url AS doc_id", "text")
    for q in ["bob dylan", "jimi hendrix", "bob", "telecaster",
              "example", "the title of a page", "zzzznone"]:
        got = [(r.doc_id, r.score) for r in bm25.bm25_topk(base, q, k=10).collect()]
        want = ora.topk(q, k=10)
        _assert_rank_identical(got, want, ctx=f"single {q!r}")


@pytest.mark.spark
def test_fielded_matches_oracle_full_query_set(spark, spark_docs, extracted):
    oracles = {}
    for q in QUERY_SET:
        if q.lang not in oracles:
            oracles[q.lang] = oracle.FieldedIndex(extracted, lang=q.lang)
        ora = oracles[q.lang]
        got_df = bm25.bm25_fielded_topk(
            spark_docs, q.q, k=q.k, lang=q.lang, shingles=q.shingles,
            tld_boost=q.region_tld, min_should_match=q.msm)
        got = [(r.doc_id, r.score) for r in got_df.collect()]
        want = ora.topk(q.q, k=q.k, shingles=q.shingles,
                        tld_boost=q.region_tld, min_should_match=q.msm)
        _assert_rank_identical(got, want, ctx=f"q{q.query_id} {q.q!r}")


def test_msm_required():
    assert bm25.msm_required(1) == 1
    assert bm25.msm_required(2) == 2
    assert bm25.msm_required(3) == 3
    assert bm25.msm_required(4) == 3
    assert bm25.msm_required(5) == 4
    assert bm25.msm_required(8) == 6
