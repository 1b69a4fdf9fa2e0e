"""Instant answers (reference: ``instant/`` + ``frontend/answer.go``).

``detect(query)`` — driver-side single-query dispatch.
``answer_queries(df)`` — Spark batch replay of a query-log column
through the same registry (Arrow-batched, for offline query-log
analytics).
"""

from .answers import ANSWERERS, Data, detect  # noqa: F401
from .batch import answer_queries  # noqa: F401
