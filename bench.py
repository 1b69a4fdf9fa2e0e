#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Measures the north-rule metrics (BASELINE.md):
- crawl-to-index build throughput (docs/sec): synthetic pages corpus →
  extraction → compressed inverted index, at TWO parallelism levels
  (local[N/4] and local[N]) on the same input → scaling efficiency
  (target ≥ 0.8);
- BM25 top-10 query latency: reference-style queries replayed against
  the compressed index (block-max WAND on), p50/p95;
- plus timings of representative driver-table queries at
  $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_DOCS (default 24000), BENCH_REPS (default 10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("BENCH_DOCS", "24000"))
REPS = int(os.environ.get("BENCH_REPS", "10"))

BENCH_QUERIES = [
    ("q_head2", "bob dylan"),
    ("q_torso2", "jimi hendrix"),
    ("q_tail1", "telecaster"),
    ("q_head1", "bob"),
    ("q_mixed5", "bob dylan jimi hendrix woodstock"),
    ("q_msm4", "bob dylan hendrix zzzzqqqqxxxx"),
]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_session(cores: int):
    from jivesearch_spark.session import get_spark
    spark = get_spark(master=f"local[{cores}]",
                      app_name=f"bench-c{cores}",
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def build_pipeline(spark, n_docs: int, out_root: str, cores: int):
    """Full crawl-to-index: gen pages → extract → docids → index."""
    from pyspark.sql import functions as F

    from jivesearch_spark import corpus
    from jivesearch_spark.extract import extract_pages_df
    from jivesearch_spark.index import IndexParams, build_index

    t0 = time.time()
    pages = corpus.pages_df(spark, n_docs, partitions=cores * 2)
    docs = (extract_pages_df(pages)
            .where(F.col("valid") & F.col("index") & F.col("canonical"))
            .select("url", "text"))
    params = IndexParams(docs_per_shard=4096, n_buckets=32, bucket_batch=32)
    man = build_index(docs, out_root, params, id_col="__none__",
                      url_col="url", log=lambda *a: None)
    dt = time.time() - t0
    return man, dt


def pctl(xs, p):
    xs = sorted(xs)
    i = max(0, min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1)))))
    return xs[i]


def main():
    t_start = time.time()
    results: dict[str, float] = {}
    work = "/tmp/jivesearch_bench"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    low_cores = max(2, CPUS // 4)

    # ---- scaling pair: identical pipeline at N/4 and N cores ----
    log(f"[bench] build at local[{low_cores}] …")
    spark = make_session(low_cores)
    _, t_low = build_pipeline(spark, N_DOCS, f"{work}/idx_low", low_cores)
    spark.stop()
    results[f"build_sec_c{low_cores}"] = round(t_low, 2)
    results[f"build_docs_per_sec_c{low_cores}"] = round(N_DOCS / t_low, 1)

    log(f"[bench] build at local[{CPUS}] …")
    spark = make_session(CPUS)
    man, t_high = build_pipeline(spark, N_DOCS, f"{work}/idx_high", CPUS)
    results[f"build_sec_c{CPUS}"] = round(t_high, 2)
    results[f"build_docs_per_sec_c{CPUS}"] = round(N_DOCS / t_high, 1)
    results["scaling_efficiency"] = round((t_low / t_high) / (CPUS / low_cores), 3)

    # ---- query replay on the compressed index (WAND on) ----
    from jivesearch_spark.query import IndexReader, bm25_topk_indexed
    reader = IndexReader(spark, f"{work}/idx_high")
    all_lat = []
    for name, q in BENCH_QUERIES:
        lats = []
        for _ in range(REPS):
            t0 = time.time()
            bm25_topk_indexed(reader, q, 10, use_wand=True).collect()
            lats.append(time.time() - t0)
        all_lat += lats
        results[name + "_p95"] = round(pctl(lats, 95), 3)
    results["query_p50"] = round(pctl(all_lat, 50), 3)
    results["query_p95"] = round(pctl(all_lat, 95), 3)

    # ---- driver-table queries at SF_DIR ----
    import __spark_entry__ as e
    qs = e.queries()
    for name in ["bm25_topk", "agg_pricing_summary", "revenue_by_nation",
                 "window_top3_orders", "dedup_exact", "token_counts",
                 "ann_cosine_topk"]:
        t0 = time.time()
        qs[name](spark, SF_DIR).collect()
        results[name] = round(time.time() - t0, 3)

    spark.stop()
    total = round(time.time() - t_start, 2)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "crawl-to-index build + BM25 top-10 query latency",
        "value": results[f"build_docs_per_sec_c{CPUS}"],
        "unit": "docs/sec",
        "queries": results,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs_built": N_DOCS,
        "cores": CPUS,
        "total_sec": total,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
