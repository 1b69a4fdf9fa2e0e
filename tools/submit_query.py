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


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["spark", "serve"], default="spark")
    ap.add_argument("--msm", action="store_true",
                    help="apply minimum-should-match -25%%")
    args = ap.parse_args(argv)

    if args.mode == "serve":
        from jivesearch_spark.serve import LocalIndex
        idx = LocalIndex(args.index)
        for q in args.query:
            hits = idx.topk(q, args.k, min_should_match=args.msm)
            print(json.dumps({"q": q, "hits": [[d, round(s, 6)] for d, s in hits]}))
        return

    from pyspark.sql import SparkSession

    from jivesearch_spark.query import IndexReader, bm25_topk_indexed
    spark = SparkSession.builder.appName("jivesearch-query").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    reader = IndexReader(spark, args.index)
    for q in args.query:
        rows = bm25_topk_indexed(reader, q, args.k,
                                 min_should_match=args.msm).collect()
        print(json.dumps({"q": q,
                          "hits": [[r.docid, round(r.score, 6)] for r in rows]}))
    spark.stop()


if __name__ == "__main__":
    main()
