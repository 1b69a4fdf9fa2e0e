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


def answer_queries(df: DataFrame, query_col: str = "query") -> DataFrame:
    """(query) → (query, answer_type, triggered, solution-as-json).

    Solutions are JSON-encoded strings so the schema stays stable
    across answer types (the reference serves exactly this as its
    ``o=json`` API output — frontend/frontend.go:99-189).
    """
    ensure_shipped(df.sparkSession)

    def _run(batches):
        import pandas as pd

        from jivesearch_spark.instant.answers import detect
        for pdf in batches:
            qs = pdf[query_col].astype(str)
            types, trig, sols = [], [], []
            for q in qs:
                d = detect(q, seed=0)
                types.append(d.type)
                trig.append(d.triggered)
                sols.append(json.dumps(d.solution, sort_keys=True)
                            if d.solution is not None else None)
            yield pd.DataFrame({"query": qs, "answer_type": types,
                                "triggered": trig, "solution": sols})

    return df.select(query_col).mapInPandas(_run, schema=ANSWER_SCHEMA)
