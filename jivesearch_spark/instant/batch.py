"""Batch replay of a query log through the instant-answer registry.

The reference answers one query per HTTP request
(frontend/answer.go:22-39); the batch equivalent — scoring a day of
query logs for answer-type coverage — maps the same registry over a
DataFrame.  Dispatch is regex parsing over short strings, so this is
control-plane work: mapInPandas (Arrow batches) keeps transfer
vectorized even though the regex walk is per-query, exactly like the
reference.  Deterministic: rng is seeded per query string.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from ..session import ensure_shipped

ANSWER_SCHEMA = "query string, answer_type string, triggered boolean, solution string"


def answer_queries(df: DataFrame, query_col: str = "query",
                   wiki_items: DataFrame | dict | None = None) -> DataFrame:
    """(query) → (query, answer_type, triggered, solution-as-json).

    Solutions are JSON-encoded strings so the schema stays stable
    across answer types (the reference serves exactly this as its
    ``o=json`` API output — frontend/frontend.go:99-189).

    ``wiki_items`` backs the Wikipedia catch-all box (last in dispatch,
    frontend/answer.go:160-163): a DataFrame with (title, …) columns —
    e.g. `wiki.synth_wiki_tables(docs).items` — or a prebuilt
    title→item dict. A DataFrame is collected and BROADCAST to the
    workers (dimension-sized, like the reference's wikipedia store
    lookup; the query log is the big side)."""
    spark = df.sparkSession
    ensure_shipped(spark)

    bc = None
    if wiki_items is not None:
        if isinstance(wiki_items, DataFrame):
            wiki_items = {r["title"].strip().lower(): r.asDict()
                          for r in wiki_items.collect()
                          if r["title"] is not None}
        bc = spark.sparkContext.broadcast(wiki_items)

    def _run(batches):
        import pandas as pd

        from jivesearch_spark.instant.answers import detect
        items = bc.value if bc is not None else None
        for pdf in batches:
            qs = pdf[query_col].astype(str)
            types, trig, sols = [], [], []
            for q in qs:
                d = detect(q, seed=0, wiki_items=items)
                types.append(d.type)
                trig.append(d.triggered)
                sols.append(json.dumps(d.solution, sort_keys=True,
                                       default=str)
                            if d.solution is not None else None)
            yield pd.DataFrame({"query": qs, "answer_type": types,
                                "triggered": trig, "solution": sols})

    return df.select(query_col).mapInPandas(_run, schema=ANSWER_SCHEMA)
