#!/usr/bin/env python
"""spark-submit entry point: pages table → compressed inverted index.

The north-rule deployment mode — on a real cluster:

    spark-submit --master <cluster> \\
        --py-files "$(python -c 'from jivesearch_spark.session import package_zip; print(package_zip())')" \\
        tools/submit_build.py --pages s3://…/pages --out s3://…/index \\
        --n-buckets 4096 --bucket-batch 64 --resume

Locally (the sandbox evidence path, tests/test_spark_submit.py):

    spark-submit --master local[8] --py-files <zip> tools/submit_build.py \\
        --pages /tmp/pages --out /tmp/idx

Reads the pages table (`url, warc_ts, html, text, lang` per the
input hint), extracts text (byte-identical to the reference Go
extractor), filters to indexable canonical docs, builds the
term-partitioned compressed index (resumable via the manifest), and
prints one JSON line of build metrics (per-partition lineage lives in
<out>/manifest.json).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True, help="pages parquet/table path")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--bucket-batch", type=int, default=64)
    ap.add_argument("--docs-per-shard", type=int, default=1 << 16)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--fielded", action="store_true",
                    help="build the fielded SERP index (per-field "
                         "sub-indexes with reference boosts) instead of "
                         "the single-text index")
    ap.add_argument("--lang", default=None,
                    help="with --fielded: restrict to one language "
                         "(the reference's one-index-per-language layout)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("jivesearch-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # under spark-submit --py-files the package is already on the
    # executors; ensure_shipped is still called for driver-launched runs
    from jivesearch_spark.extract import extract_pages_df
    from jivesearch_spark.index import IndexParams, build_index
    from jivesearch_spark.session import ensure_shipped
    ensure_shipped(spark)

    t0 = time.time()
    pages = spark.read.parquet(args.pages)
    # index build never consumes links — skip frontier link resolution
    extracted = (extract_pages_df(pages, collect_links=False)
                 .where(F.col("valid") & F.col("index") & F.col("canonical")))
    params = IndexParams(docs_per_shard=args.docs_per_shard,
                         n_buckets=args.n_buckets,
                         bucket_batch=args.bucket_batch)
    log = lambda *a: print(*a, file=sys.stderr)  # noqa: E731
    if args.fielded:
        from jivesearch_spark.fielded import build_fielded_index
        build_fielded_index(extracted, args.out, params, lang=args.lang,
                            resume=args.resume, log=log)
        from jivesearch_spark.index import Manifest
        import os
        man = Manifest.load(os.path.join(args.out, "fields", "title"))
    else:
        docs = extracted.select("url", "text")
        man = build_index(docs, args.out, params, id_col="__none__",
                          url_col="url", resume=args.resume, log=log)
    wall = time.time() - t0
    print(json.dumps({
        "n_docs": man.n_docs, "avgdl": round(man.avgdl, 4),
        "n_shards": man.n_shards, "batches": len(man.completed_batches),
        "fielded": bool(args.fielded), "seconds": round(wall, 2),
        "docs_per_sec": round(man.n_docs / wall, 1) if wall else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
