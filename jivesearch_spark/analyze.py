"""Pinned text analyzer — one definition, three engines.

The reference delegates analysis to Elasticsearch's `standard`
tokenizer + lowercase filter (+ a bigram shingle filter for the
`*.shingles` subfields) — mapping at
/root/reference/search/document/elasticsearch.go:83-99. For
rank-identity we pin ONE analyzer and implement it identically in:

- Spark (JVM-side, whole-stage-codegen; no Python in the hot path),
- pure Python (the brute-force oracle), and
- ANSI SQL (DuckDB correctness oracles).

Pinned v1 semantics (the "standard-ascii" profile):
    lowercase → split on /[^a-z0-9]+/ → drop empty tokens.

Applied identically to documents and queries (critical for
rank-identity, SURVEY.md §7.3). Bigram shingles (min=max=2, no
unigrams) mirror the `shingles` filter. Language-specific stemming
chains (elasticsearch.go:205-289) are a later profile; the scorer is
parameterized on the analyzer so adding one cannot change v1 ranks.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The ONE tokenizer delimiter pattern (Java, RE2 and Python compatible).
TOKEN_DELIM = "[^a-z0-9]+"

_PY_DELIM = re.compile(TOKEN_DELIM)


# -- Spark (JVM) --------------------------------------------------------------

def tokens(col: Column | str) -> Column:
    """array<string> of analyzed tokens — pure built-in functions."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_DELIM), lambda x: x != F.lit(""))


def bigrams(col: Column | str) -> Column:
    """Bigram shingles of an already-tokenized array column
    (ES shingle filter min=max=2, output_unigrams=false)."""
    toks = F.col(col) if isinstance(col, str) else col
    return F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.slice(toks, 1, F.size(toks) - 1),
            lambda x, i: F.concat_ws(" ", x, F.element_at(toks, i + 2)),
        )
    )


# -- Python (oracle) ----------------------------------------------------------

def py_tokens(text: str) -> list[str]:
    if not text:
        return []
    return [t for t in _PY_DELIM.split(text.lower()) if t]


def py_bigrams(toks: list[str]) -> list[str]:
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


# -- SQL (DuckDB oracle fragments) ---------------------------------------------

def sql_tokens(expr: str) -> str:
    """DuckDB expression producing the identical token list."""
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{TOKEN_DELIM}'),"
        " t -> t <> '')"
    )
