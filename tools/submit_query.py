#!/usr/bin/env python
"""spark-submit entry point: top-k BM25 queries over a built index.

    spark-submit --master local[8] --py-files <zip> tools/submit_query.py \\
        --index /tmp/idx --query "bob dylan" --query "jimi hendrix" --k 10

Prints one JSON line per query: {"q": …, "hits": [[docid, score], …]}.
`--mode serve` uses the driver-side pruned-read path (no Spark job;
rank-identical by the tests/test_serve.py gate) — the flavor a serving
tier runs; `--mode spark` (default) runs the distributed scorer.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# plain-python convenience; under spark-submit --py-files the zip on
# the executor path takes precedence and this is a no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", default=[])
    ap.add_argument("--queries-file",
                    help="file with one query per line — answered as ONE "
                         "Spark job (bm25_topk_batch, shared pruned scan)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["spark", "serve"], default="spark")
    ap.add_argument("--msm", action="store_true",
                    help="apply minimum-should-match -25%%")
    ap.add_argument("--fielded", action="store_true",
                    help="query a fielded SERP index (built with "
                         "submit_build.py --fielded)")
    ap.add_argument("--tld", default=None,
                    help="with --fielded: regional tld should-clause")
    ap.add_argument("--page", default="1",
                    help="result page (clamped like frontend/search.go: "
                         "<1 or unparseable → 1); offset = (page-1)*k")
    ap.add_argument("--lang-param", default=None, metavar="L",
                    help="request 'l' param (frontend/search.go:122)")
    ap.add_argument("--accept-language", default=None,
                    help="Accept-Language header to derive lang/region/tld")
    ap.add_argument("--region-param", default=None, metavar="R",
                    help="request 'r' param (frontend/search.go:141)")
    args = ap.parse_args(argv)
    if not args.query and not args.queries_file:
        ap.error("need --query or --queries-file")

    from jivesearch_spark import paging
    offset = (paging.clamp_page(args.page) - 1) * args.k

    if args.lang_param or args.accept_language or args.region_param:
        # request-side detection feeds the regional tld boost (and
        # tells the caller which per-lang index to point --index at)
        from jivesearch_spark.request_lang import detect_request
        lang, region, tld = detect_request(args.lang_param,
                                           args.accept_language,
                                           args.region_param)
        if args.tld is None:
            args.tld = tld
        print(json.dumps({"detected": {"lang": lang, "region": region,
                                       "tld_boost": tld}}), file=sys.stderr)

    queries = list(args.query)
    if args.queries_file:
        with open(args.queries_file) as f:
            queries += [ln.strip() for ln in f if ln.strip()]

    if args.mode == "serve":
        if args.fielded:
            from jivesearch_spark.fielded import FieldedLocalIndex
            fidx = FieldedLocalIndex(args.index)
            for q in queries:
                # fielded queries always apply the reference's MSM -25%
                hits = fidx.topk(q, args.k, tld_boost=args.tld,
                                 offset=offset)
                print(json.dumps({"q": q, "hits": [[u, round(s, 6)]
                                                   for u, s in hits]}))
            return
        from jivesearch_spark.serve import LocalIndex
        idx = LocalIndex(args.index)
        batch = idx.topk_batch(queries, args.k, min_should_match=args.msm,
                               offset=offset)
        for q in queries:
            print(json.dumps({"q": q, "hits": [[d, round(s, 6)]
                                               for d, s in batch[q]]}))
        return

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("jivesearch-query").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if args.fielded:
        from jivesearch_spark.fielded import FieldedReader, bm25_fielded_indexed
        freader = FieldedReader(spark, args.index)
        for q in queries:
            rows = bm25_fielded_indexed(freader, q, args.k,
                                        tld_boost=args.tld,
                                        offset=offset).collect()
            print(json.dumps({"q": q, "hits": [[r.doc_id, round(r.score, 6)]
                                               for r in rows]}))
        spark.stop()
        return

    from jivesearch_spark.query import (IndexReader, bm25_topk_batch,
                                        bm25_topk_indexed)
    reader = IndexReader(spark, args.index)
    if len(queries) > 1:
        # whole log in one job: shared pruned scan, per-qid window top-k
        qid_of = {f"q{i}": q for i, q in enumerate(queries)}
        rows = bm25_topk_batch(reader, list(qid_of.items()), args.k,
                               min_should_match=args.msm,
                               offset=offset).collect()
        by_qid: dict = {}
        for r in rows:
            by_qid.setdefault(r.qid, []).append([r.docid, round(r.score, 6)])
        for qid, q in qid_of.items():
            print(json.dumps({"q": q, "hits": by_qid.get(qid, [])}))
    else:
        for q in queries:
            rows = bm25_topk_indexed(reader, q, args.k,
                                     min_should_match=args.msm,
                                     offset=offset).collect()
            print(json.dumps({"q": q, "hits": [[r.docid, round(r.score, 6)]
                                               for r in rows]}))
    spark.stop()


if __name__ == "__main__":
    main()
