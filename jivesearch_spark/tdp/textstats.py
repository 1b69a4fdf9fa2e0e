"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting — all JVM-side built-ins so every
one has an exact DuckDB SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import analyze

#: tiny pinned stopword lists per language (top function words) — the
#: n-gram/stopword-ratio heuristic; deterministic and SQL-expressible.
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "it", "that", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"],
    "pt": ["o", "a", "de", "que", "e", "do", "da", "em", "um", "para"],
}

#: BPE-ish subword proxy: runs of letters, digits, or single
#: punctuation — a deterministic stand-in for a trained BPE vocab.
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, ws_tokens, bpe_tokens, chars) — sizing for training data."""
    t = F.col(text_col)
    low = F.lower(t)
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(F.filter(F.split(t, "\\s+"), lambda x: x != F.lit(""))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(low, F.lit(BPE_REGEX), 0)).alias("bpe_tokens"),
        F.length(t).alias("chars"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0,1]:
    length band, alpha ratio, stopword ratio, mean token length.
    """
    toks = analyze.tokens(F.col(text_col))
    n_toks = F.size(toks)
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", ""))
    total = F.greatest(F.length(F.col(text_col)), F.lit(1))
    mean_len = F.when(n_toks > 0,
                      F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
                      / n_toks).otherwise(F.lit(0.0))
    len_band = F.when((n_toks >= 10) & (n_toks <= 5000), F.lit(1.0)) \
                .when(n_toks > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_toks > 0, n_stop / n_toks).otherwise(F.lit(0.0))
    alpha_ratio = alpha / total
    wl_ok = F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    score = (len_band + alpha_ratio + F.least(stop_ratio * F.lit(3.0), F.lit(1.0)) + wl_ok) / 4.0
    return docs.select(
        F.col(id_col).alias("id"),
        n_toks.alias("n_tokens"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(score, 4).alias("quality"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: argmax over per-language stopword
    hit counts; ties and zero-evidence → 'und'. Exact-SQL-expressible.
    """
    toks = analyze.tokens(F.col(text_col))
    scores = []
    for lang, words in sorted(STOPWORDS.items()):
        sw = F.array([F.lit(w) for w in words])
        scores.append(
            F.struct(F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).alias("hits"),
                     F.lit(lang).alias("lang")))
    arr = F.array(*scores)
    best = F.array_max(arr)  # struct ordering: hits first, then lang desc? no — lexicographic
    # deterministic tie-break: highest hits, then lexicographically
    # LAST language (array_max on (hits, lang)); pinned and mirrored in SQL
    return docs.select(
        F.col(id_col).alias("id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].alias("evidence"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints: full-text digest over the
    normalized token stream + a winnowing-style min-hash of token
    5-gram digests (rolling-window fingerprinting)."""
    toks = analyze.tokens(F.col(text_col))
    norm = F.concat_ws(" ", toks)
    grams5 = F.when(F.size(toks) < 5, F.array(norm)).otherwise(
        F.transform(F.slice(toks, 1, F.size(toks) - 4),
                    lambda x, i: F.concat_ws(" ", x,
                                             F.element_at(toks, i + 2),
                                             F.element_at(toks, i + 3),
                                             F.element_at(toks, i + 4),
                                             F.element_at(toks, i + 5))))
    return docs.select(
        F.col(id_col).alias("id"),
        F.md5(norm).alias("fingerprint"),
        F.array_min(F.transform(grams5, lambda g: F.crc32(g))).alias("min_gram_crc"),
    )
