"""Display & scalar column functions (SURVEY.md §2.8).

The reference's template funcMap (``frontend/filters.go:36-65``) plus
assorted scalar helpers are re-expressed here as Spark Column
functions — all built-in expressions (whole-stage codegen), no Python.

Crypto/encoding functions need no wrappers; the mapping is:
``md5``→``F.md5``, ``sha1``→``F.sha1``, ``sha224/256/512``→
``F.sha2(c, n)`` (instant/hash.go:77), ``base64``→``F.base64``
(frontend/search.go:491), url en/decode → ``F.url_encode`` /
``F.url_decode`` (instant/urlencode.go:53).

Byte-vs-char note: Go's ``len``/slicing are byte-based; these column
versions use character semantics, identical on ASCII (the synthetic
corpus) — the byte-exact path for extraction lives in extract.py where
it is an invariant; display truncation is not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def fields(col) -> Column:
    """Go ``strings.Fields`` — split on whitespace runs, no empties."""
    return F.filter(F.split(_to_col(col), r"\s+"), lambda t: t != "")


def truncate(col, max_len: int, preserve: bool = True) -> Column:
    """frontend/filters.go:412-423 — used at 60/215 chars for display
    (frontend/search.go:405-410). preserve=True keeps whole words and
    appends " ..."; else hard cut + "..."."""
    c = _to_col(col)
    if preserve:
        ws = fields(F.substring(c, 1, max_len + 1))
        cut = F.concat(
            F.array_join(F.slice(ws, 1,
                                 F.greatest(F.size(ws) - 1, F.lit(0))), " "),
            F.lit(" ..."))
    else:
        cut = F.concat(F.substring(c, 1, max_len), F.lit("..."))
    return F.when(F.length(c) <= max_len, c).otherwise(cut)


def commafy(col) -> Column:
    """frontend/filters.go:188-199 (humanize.Comma for integers)."""
    return F.format_number(_to_col(col), 0)


def percent(col) -> Column:
    """frontend/filters.go:243-245 — v → "NN.NN%"."""
    return F.format_string("%.2f%%", _to_col(col) * 100)


def strip_html(col) -> Column:
    """frontend/filters.go:256-260 (goquery .Text() approximated as a
    tag strip; full extraction semantics live in extract.py)."""
    return F.regexp_replace(_to_col(col), "<[^>]*>", "")


def remove_duplicate_words(col) -> Column:
    """document.go:370-382 — order-preserving word dedup
    (F.array_distinct keeps first occurrences in order)."""
    return F.array_join(F.array_distinct(fields(col)), " ")


def wiki_clean_text(col, max_len: int = -1) -> Column:
    """instant/wikipedia/wikipedia.go:38-64 — strip ``\\s?(...)``
    parentheticals (non-greedy), drop NBSP, then word-preserving
    truncate appending " ..." unless the cut ends in '.'."""
    c = F.regexp_replace(_to_col(col), r"\s?\((.*?)\)", "")
    c = F.regexp_replace(c, "\u00a0", "")
    if max_len == -1:
        return c
    ws = fields(F.substring(c, 1, max_len + 1))
    cut = F.array_join(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))), " ")
    cut = F.when(cut.endswith("."), cut).otherwise(F.concat(cut, F.lit(" ...")))
    return F.when(F.length(c) <= max_len, c).otherwise(cut)


def wikipedia_canonical(col) -> Column:
    """bangs/bangs.go:128-130 — "bob maRLey" → "Bob_Marley".
    F.initcap matches Go strings.Title for space-separated words (the
    exact rune-level variant for arbitrary text is
    bangs.wikipedia_canonical, driver-side)."""
    return F.regexp_replace(F.initcap(F.lower(_to_col(col))), " ", "_")


def wikimedia_image_url(col) -> Column:
    """postgresql.go:624-636 build_image — commons URL from the
    md5-prefix sharding of the underscored file name."""
    s = F.regexp_replace(_to_col(col), " ", "_")
    m = F.md5(s)
    return F.concat(F.lit("https://upload.wikimedia.org/wikipedia/commons/"),
                    F.substring(m, 1, 1), F.lit("/"),
                    F.substring(m, 1, 2), F.lit("/"), s)


def date_basic(col) -> Column:
    """``basic_date`` yyyyMMdd (document.go:140-143,
    document/elasticsearch.go:181)."""
    return F.date_format(_to_col(col), "yyyyMMdd")


def date_minute(col) -> Column:
    """robots cache stamp ``200601021504`` (robots/robots.go:10)."""
    return F.date_format(_to_col(col), "yyyyMMddHHmm")


def path_parts(col) -> Column:
    """document.go:124-131 — url path → deduped word string: '/'
    and '-' → space, strip .html/.htm/.php suffix, fields, dedup."""
    c = F.regexp_replace(_to_col(col), r"\.(html|htm|php)$", "")
    c = F.translate(c, "/-", "  ")
    return F.array_join(F.array_distinct(fields(c)), " ")
