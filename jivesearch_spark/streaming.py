"""Structured-Streaming ingest: incremental segment builds + dedup.

The reference's crawler is a continuous stateful dataflow (frontier
set + TTL claims, ``queue/redis.go:34-108``; 30-day recrawl window,
``crawler.go:236-239``) feeding bulk upserts into ES, whose segment
model (Lucene) absorbs increments.  Batch north rule aside, the Spark
re-expression of that ingest path is:

- ``deduped_pages_stream`` — frontier/recrawl dedup as
  ``withWatermark(warc_ts) + dropDuplicates(url)``: event-time state
  with TTL instead of Redis SET + ES date check (P3/§2.9).
- ``run_incremental_index`` — ``readStream`` over a pages directory;
  every micro-batch becomes ONE new index segment with a docid range
  disjoint from all previous segments (offset carried in a segments
  manifest — the per-partition lineage artifact).  Exactly-once:
  foreachBatch skips batch ids already committed, so checkpoint
  replays are idempotent.
- ``compact_segments`` — deterministic merge of all committed segments
  into a serving index (``index.merge_indexes``): bytes identical to a
  single-shot batch build over the same pages, which is the gate in
  tests/test_streaming.py. BM25 needs corpus-global stats, so serving
  reads the compacted index; segments are the write-optimized form
  (exactly Lucene's segment + merge contract, and the reference's
  staged-publish pattern, postgresql.go:320-369).

At cluster scale each micro-batch is a normal distributed build job;
the only serial state is the tiny segments manifest (driver-side
JSON, atomically replaced).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus import PAGES_SCHEMA
from .extract import extract_pages_df
from .index import IndexParams, Manifest, assign_doc_ids, build_index, merge_indexes

SEGMENTS = "segments.json"


def pages_stream(spark, pages_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger or 4))
    return reader.parquet(pages_dir)


def deduped_pages_stream(stream: DataFrame, window: str = "30 days") -> DataFrame:
    """Frontier/recrawl dedup (P3, §2.9): keep one row per url within
    the event-time watermark; state expires after ``window`` exactly
    like the reference's 30-day recrawl check (crawler.go:236-239,
    config.go:114)."""
    return stream.withWatermark("warc_ts", window).dropDuplicates(["url"])


def _load_segments(root: str) -> dict:
    p = os.path.join(root, SEGMENTS)
    if not os.path.exists(p):
        return {"segments": [], "n_docs": 0}
    with open(p) as f:
        return json.load(f)


def _save_segments(root: str, state: dict) -> None:
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, SEGMENTS + ".tmp")
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(root, SEGMENTS))


def run_incremental_index(spark, pages_dir: str, root: str,
                          params: IndexParams | None = None,
                          max_files_per_trigger: int | None = None,
                          available_now: bool = True, log=print):
    """Stream pages → one index segment per micro-batch under
    ``root/segments/seg_<batch_id>``, docids offset by the running doc
    count. ``available_now=True`` drains the current directory and
    stops (the incremental-refresh job shape: run per new snapshot);
    ``False`` keeps listening."""
    params = params or IndexParams()
    seg_root = os.path.join(root, "segments")
    checkpoint = os.path.join(root, "_checkpoint")

    def _process(batch_df: DataFrame, batch_id: int):
        state = _load_segments(root)
        done_ids = {s["batch_id"] for s in state["segments"]}
        if batch_id in done_ids:   # checkpoint replay — idempotent skip
            log(f"[stream] batch {batch_id} already committed, skipping")
            return
        docs = (extract_pages_df(batch_df)
                .where(F.col("valid") & F.col("index") & F.col("canonical"))
                .select("url", "text"))
        seg_dir = os.path.join(seg_root, f"seg_{batch_id}")
        offset = state["n_docs"]
        # staging lives OUTSIDE seg_dir: build_index wipes its out_dir
        # on a fresh build
        with_ids = assign_doc_ids(
            docs, key="url",
            staging_dir=os.path.join(root, "docid_staging", f"seg_{batch_id}"))
        with_ids = with_ids.withColumn(
            "docid", (F.col("docid") + F.lit(offset)).cast("long"))
        man = build_index(with_ids, seg_dir, params, id_col="docid",
                          url_col="url", log=log)
        state["segments"].append(
            {"batch_id": batch_id, "dir": seg_dir, "n_docs": man.n_docs,
             "docid_base": offset})
        state["n_docs"] = offset + man.n_docs
        _save_segments(root, state)
        log(f"[stream] committed segment seg_{batch_id}: "
            f"{man.n_docs} docs at base {offset}")

    stream = pages_stream(spark, pages_dir, max_files_per_trigger)
    writer = stream.writeStream.foreachBatch(_process) \
        .option("checkpointLocation", checkpoint)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return _load_segments(root)
    return writer.start()


def compact_segments(spark, root: str, out_dir: str,
                     params: IndexParams | None = None, log=print) -> Manifest:
    """Merge all committed segments into a serving index (bytes equal
    to a single-shot build over the union — the determinism gate)."""
    state = _load_segments(root)
    dirs = [s["dir"] for s in state["segments"]]
    if not dirs:
        raise ValueError(f"no segments committed under {root}")
    return merge_indexes(spark, dirs, out_dir, params, log=log)
