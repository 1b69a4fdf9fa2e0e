"""Language-analyzer index profile (pinned LANG_PROFILE) gate.

Stemmed tokens are pure [a-z0-9]+ strings, so an index built with
`analyzer="english"` must be posting-identical to a standard index
built over pre-stemmed text (`" ".join(py_tokens_lang(text))`), and
its query side must stem the query with the same chain — verified by
comparing the english-profile path against that surrogate end-to-end,
Spark and serve flavors.
"""

import pytest
from pyspark.sql import functions as F

from jivesearch_spark import analyze_lang
from jivesearch_spark.index import IndexParams, build_index
from jivesearch_spark.query import IndexReader, bm25_topk_indexed
from jivesearch_spark.serve import LocalIndex

SF_DIR = "/root/testdata/sf0.001"
QUERIES = ["the fastest keys ordered", "sparking grouped queries",
           "customers running windows", "merged parts", "slowly"]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("lang_index")
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .selectExpr("doc_id AS docid", "text"))

    root_en = str(base / "english")
    build_index(docs, root_en,
                IndexParams(docs_per_shard=100, n_buckets=8, bucket_batch=8,
                            analyzer="english"),
                url_col=None, log=lambda *a: None)

    stem = F.udf(lambda t: " ".join(analyze_lang.py_tokens_lang(t or "")))
    root_std = str(base / "standard")
    build_index(docs.withColumn("text", stem("text")), root_std,
                IndexParams(docs_per_shard=100, n_buckets=8, bucket_batch=8),
                url_col=None, log=lambda *a: None)
    return root_en, root_std


@pytest.mark.spark
def test_lang_index_matches_prestemmed_surrogate(spark, built):
    root_en, root_std = built
    r_en = IndexReader(spark, root_en)
    r_std = IndexReader(spark, root_std)
    assert r_en.man.params["analyzer"] == "english"
    for q in QUERIES:
        got = [(r.docid, round(r.score, 9)) for r in
               bm25_topk_indexed(r_en, q, 10).collect()]
        q_stemmed = " ".join(analyze_lang.py_tokens_lang(q))
        want = [(r.docid, round(r.score, 9)) for r in
                bm25_topk_indexed(r_std, q_stemmed, 10).collect()]
        assert got == want, q
    # stemming is what makes these inflected queries match at all
    assert bm25_topk_indexed(r_en, "customers running windows", 10).count() > 0


@pytest.mark.spark
def test_lang_index_serve_matches_spark(spark, built):
    root_en, _ = built
    r_en = IndexReader(spark, root_en)
    idx = LocalIndex(root_en)
    for q in QUERIES:
        spark_rows = [(r.docid, round(r.score, 9)) for r in
                      bm25_topk_indexed(r_en, q, 10).collect()]
        served = [(d, round(s, 9)) for d, s in idx.topk(q, 10)]
        assert served == spark_rows, q


@pytest.mark.spark
def test_stopwords_removed_from_index(spark, built):
    root_en, _ = built
    r_en = IndexReader(spark, root_en)
    assert r_en.stats_for(["the", "of", "a"]) == {}


@pytest.mark.spark
def test_merge_inherits_analyzer(spark, built, tmp_path):
    """merge_indexes without explicit params must carry the segments'
    analyzer into the merged manifest (else queries against stemmed
    postings would silently tokenize unstemmed)."""
    from jivesearch_spark.index import merge_indexes

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .selectExpr("doc_id AS docid", "text"))
    params = IndexParams(docs_per_shard=100, n_buckets=8, bucket_batch=8,
                         analyzer="english")
    lo = docs.where("docid < 250")
    hi = docs.where("docid >= 250")
    s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(lo, s1, params, url_col=None, log=lambda *a: None)
    build_index(hi, s2, params, url_col=None, log=lambda *a: None)
    merged = str(tmp_path / "merged")
    man = merge_indexes(spark, [s1, s2], merged, log=lambda *a: None)
    assert man.params["analyzer"] == "english"

    r_merged = IndexReader(spark, merged)
    r_full = IndexReader(spark, built[0])
    q = "customers running windows"
    got = [(r.docid, round(r.score, 9)) for r in
           bm25_topk_indexed(r_merged, q, 10).collect()]
    want = [(r.docid, round(r.score, 9)) for r in
            bm25_topk_indexed(r_full, q, 10).collect()]
    assert got and got == want


@pytest.mark.spark
def test_profile_mismatch_fails_loudly(spark, built, tmp_path):
    """A lang index whose manifest records a different analyzer
    profile — or NONE ("" = pre-versioning, by definition built with
    the replaced v1 tokenizer) — must refuse queries instead of
    silently returning wrong/empty results."""
    import json
    import os
    import shutil

    root_en, root_std = built
    for bad_prof in ["lang-v0", ""]:
        tampered = str(tmp_path / f"tampered_{bad_prof or 'empty'}")
        shutil.copytree(root_en, tampered)
        mp = os.path.join(tampered, "manifest.json")
        with open(mp) as fh:
            man = json.load(fh)
        man["params"]["analyzer_profile"] = bad_prof
        with open(mp, "w") as fh:
            json.dump(man, fh)
        reader = IndexReader(spark, tampered)
        with pytest.raises(ValueError, match="analyzer profile"):
            bm25_topk_indexed(reader, "customer", 10)
    # the standard analyzer is profile-independent: "" stays queryable
    tampered_std = str(tmp_path / "tampered_std")
    shutil.copytree(root_std, tampered_std)
    mp = os.path.join(tampered_std, "manifest.json")
    with open(mp) as fh:
        man = json.load(fh)
    man["params"]["analyzer_profile"] = ""
    with open(mp, "w") as fh:
        json.dump(man, fh)
    reader = IndexReader(spark, tampered_std)
    assert bm25_topk_indexed(reader, "customer", 10).count() >= 0
