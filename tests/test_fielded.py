"""Fielded-index gate: compressed per-field index ≡ brute-force SERP
scorer (`bm25.bm25_fielded_topk`) over the WHOLE reference query set —
same urls, same scores — in both Spark and serving modes.
"""

import pytest
from pyspark.sql import functions as F

from jivesearch_spark import bm25, corpus
from jivesearch_spark.extract import extract_page
from jivesearch_spark.fielded import (FieldedLocalIndex, FieldedReader,
                                      bm25_fielded_indexed,
                                      build_fielded_index)
from jivesearch_spark.index import IndexParams
from jivesearch_spark.queries import QUERY_SET

N_DOCS = 600
PARAMS = IndexParams(docs_per_shard=200, n_buckets=4, bucket_batch=4)


@pytest.fixture(scope="module")
def spark_docs(spark):
    rows = []
    for i in range(N_DOCS):
        url, ts, html, text, lang = corpus.gen_page(i)
        d = extract_page(url, html)
        rows.append((d.url, d.title, d.keywords, d.description, d.domain,
                     d.path_parts, d.tld, d.index and d.canonical, d.lang,
                     d.text))
    df = spark.createDataFrame(
        rows,
        "url string, title string, keywords string, description string, "
        "domain string, path_parts string, tld string, index boolean, "
        "lang string, text string",
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def roots(spark, spark_docs, tmp_path_factory):
    base = tmp_path_factory.mktemp("fielded")
    out = {}
    for lang in {q.lang for q in QUERY_SET}:
        root = str(base / (lang or "all"))
        build_fielded_index(spark_docs.where("index"), root, PARAMS,
                            lang=lang, log=lambda *a: None)
        out[lang] = root
    return out


@pytest.mark.spark
def test_fielded_indexed_matches_bruteforce_full_query_set(
        spark, spark_docs, roots):
    readers = {lang: FieldedReader(spark, root)
               for lang, root in roots.items()}
    for q in QUERY_SET:
        want = [(r.doc_id, round(r.score, 6)) for r in
                bm25.bm25_fielded_topk(
                    spark_docs, q.q, k=q.k, lang=q.lang, shingles=q.shingles,
                    tld_boost=q.region_tld, min_should_match=q.msm).collect()]
        got = [(r.doc_id, round(r.score, 6)) for r in
               bm25_fielded_indexed(
                   readers[q.lang], q.q, k=q.k, shingles=q.shingles,
                   tld_boost=q.region_tld, min_should_match=q.msm).collect()]
        assert got == want, f"q{q.query_id} {q.q!r}"


@pytest.mark.spark
def test_fielded_serve_matches_spark(spark, roots):
    for lang, root in roots.items():
        reader = FieldedReader(spark, root)
        idx = FieldedLocalIndex(root)
        for q in [qq for qq in QUERY_SET if qq.lang == lang][:4]:
            spark_rows = [(r.doc_id, round(r.score, 6)) for r in
                          bm25_fielded_indexed(
                              reader, q.q, k=q.k, shingles=q.shingles,
                              tld_boost=q.region_tld,
                              min_should_match=q.msm).collect()]
            served = [(u, round(s, 6)) for u, s in
                      idx.topk(q.q, k=q.k, shingles=q.shingles,
                               tld_boost=q.region_tld,
                               min_should_match=q.msm)]
            assert served == spark_rows, f"q{q.query_id} {q.q!r}"


@pytest.mark.spark
def test_fielded_resume_rebuilds_only_missing_field(spark, spark_docs, roots,
                                                   tmp_path):
    import shutil

    root = str(tmp_path / "resume")
    build_fielded_index(spark_docs.where("index"), root, PARAMS,
                        log=lambda *a: None)
    reader = FieldedReader(spark, root)
    q = QUERY_SET[0]
    before = [(r.doc_id, round(r.score, 6)) for r in
              bm25_fielded_indexed(reader, q.q, k=q.k).collect()]

    # simulate a kill mid-build: one field's sub-index lost
    shutil.rmtree(f"{root}/fields/title")
    skipped = []
    build_fielded_index(spark_docs.where("index"), root, PARAMS, resume=True,
                        log=lambda *a: skipped.append(" ".join(map(str, a))))
    assert any("already complete" in s for s in skipped)

    after = [(r.doc_id, round(r.score, 6)) for r in
             bm25_fielded_indexed(FieldedReader(spark, root), q.q,
                                  k=q.k).collect()]
    assert after == before


@pytest.mark.spark
def test_fielded_empty_query(spark, roots):
    reader = FieldedReader(spark, roots[None])
    assert bm25_fielded_indexed(reader, "", 10).count() == 0
    assert bm25_fielded_indexed(reader, "zzzznotaterm", 10).count() == 0


@pytest.mark.spark
def test_fielded_serving_bounds_carry_field_boost(roots):
    """The lazy kernel retires blocks by comparing bounds against θ
    computed from boost-scaled scores (w = idf × boost), so the cached
    block bounds must be the stored max_score_ub (idf × max tf-norm,
    codec.py:127) scaled by the SAME boost — an unboosted bound
    under-states boosted fields 1.5-3× and silently drops top-k
    winners (regression: test_wand_kernel.py
    ::test_lazy_kernel_boosted_weights_need_boosted_bounds)."""
    import numpy as np
    import pyarrow.dataset as pads

    idx = FieldedLocalIndex(roots[None])
    idx.topk("bob dylan guitar", k=10, use_wand=True)
    assert idx._meta_cache, "query should have populated the tb cache"
    checked = 0
    for (field, term), meta in idx._meta_cache.items():
        # tld key scores with boost 1.0 (fielded.py _query_plan)
        boost = idx.fields[field]["boost"] if field in idx.fields else 1.0
        dset = idx._post[field]
        if dset is None:
            continue
        pdf = dset.to_table(
            filter=pads.field("term") == term,
            columns=["shard", "block_id", "max_score_ub"]).to_pandas()
        stored = pdf.sort_values(["shard", "block_id"],
                                 kind="mergesort")["max_score_ub"].values
        assert np.allclose(np.sort(meta["ub"]), np.sort(stored * boost),
                           rtol=1e-12), (field, term)
        checked += 1
    assert checked >= 2


@pytest.mark.spark
def test_fielded_tld_only_bail_charges_cache(roots):
    """A query whose only retrievable block tables are TLD entries
    bails with [] — but the entries it parked in _meta_cache must be
    charged to the incremental eviction accounting, or a long-running
    tier grows the cache past arr_cache_max_postings unseen."""
    idx = FieldedLocalIndex(roots[None])
    tlds = [t for t in ("com", "org", "net", "io", "de", "jp", "uk")
            if idx.stats_for("tld", [t])]
    assert tlds, "fixture corpus should have at least one known tld"
    # postings-less text fields are a constructor-supported state
    # (zero-posting fields write no postings dir); forcing it routes
    # the query to the tld-only early return
    for name in idx.fields:
        idx._post[name] = None
    assert idx.topk("bob dylan", k=5, tld_boost=tlds[0]) == []
    parked = [k for k in idx._meta_cache if k[0] == "tld"]
    assert parked, "tld block table should have been cached"
    assert all(k in idx._cost for k in parked)
    assert idx._cost_total == sum(idx._cost.values())
    assert idx._cost_total > 0
