"""BM25 scoring — pinned formula + brute-force DataFrame reference path.

Pinned scorer (BASELINE.md / SURVEY.md §4): Lucene-7-style BM25 with
ES 6.2.4 defaults (no ``similarity`` override in any reference mapping,
/root/reference/search/document/elasticsearch.go:80-200):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t, d)   = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    score(q, d) = Σ_t Σ_f boost_f · idf_f(t) · tfn_f(t, d)

with k1 = 1.2, b = 0.75, exact field lengths (no SmallFloat norm
quantization — our oracle IS the scorer spec), ties broken by doc id
ascending. Field boosts follow the reference query
(/root/reference/search/elasticsearch.go:32-48): domain^3, path^2,
title^1.5, description^1; bigram-shingle should-clauses on
title/description add with boost 1; minimum_should_match "-25%" ⇒ a
doc must match ≥ n - floor(n/4) of the n query terms in some scoring
field.

The brute-force path here is entirely declarative DataFrame ops (zero
Python UDFs) — it both serves as the correctness oracle for the
compressed-index + WAND path and demonstrates the scale shape: the
only shuffles are the (term,doc) aggregation and the final per-doc
sum; the tiny query-term table is broadcast.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import analyze

K1 = 1.2
B = 0.75

#: (field, boost) pairs searched by the reference SERP query
#: (search/elasticsearch.go:35-40). `keywords` is indexed but NOT queried.
SCORING_FIELDS = [("domain", 3.0), ("path_parts", 2.0), ("title", 1.5),
                  ("description", 1.0)]
#: shingle should-clause fields (search/elasticsearch.go:43-47)
SHINGLE_FIELDS = [("title", 1.0), ("description", 1.0)]


def msm_required(n_terms: int) -> int:
    """minimum_should_match "-25%" (search/elasticsearch.go:40)."""
    return n_terms - n_terms // 4


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf: float, dl: float, avgdl: float) -> float:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / max(avgdl, 1e-9)))


# ---------------------------------------------------------------------------
# Single-field brute force (documents-table flavor; also the WAND oracle)
# ---------------------------------------------------------------------------

def bm25_topk(docs: DataFrame, query: str, k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              min_should_match: bool = False) -> DataFrame:
    """Top-k BM25 over a single text column, 100% built-in functions.

    Plan shape (scale notes): the docs scan is read once, tokenized
    JVM-side; `explode` → partial-agg `groupBy(id, term)` (map-side
    combine), the per-term df/idf table is a handful of rows and is
    broadcast back; the final per-doc sum + TakeOrderedAndProject
    gives global top-k without a full sort.
    """
    q_terms = sorted(set(analyze.py_tokens(query)))
    if not q_terms:
        return docs.select(F.col(id_col).alias("doc_id"),
                           F.lit(0.0).alias("score")).limit(0)

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        analyze.tokens(F.col(text_col)).alias("toks"),
    )

    # dl rides along through the explode — no separate doc-length scan
    # or N-row join (that join would not be broadcastable at scale).
    tf = (
        toks.select("doc_id", F.size("toks").alias("dl"),
                    F.explode("toks").alias("term"))
        .where(F.col("term").isin(q_terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    # corpus stats: one tiny row, broadcast via crossJoin
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )
    # tf rows are already distinct per (doc, term) ⇒ df is a plain count
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        .withColumn(
            "tscore",
            F.col("idf") * F.col("tf") * (K1 + 1.0)
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))),
        )
    )

    agg = scored.groupBy("doc_id").agg(
        F.sum("tscore").alias("score"),
        F.countDistinct("term").alias("n_matched"),
    )
    if min_should_match:
        agg = agg.where(F.col("n_matched") >= msm_required(len(q_terms)))

    # pinned tie-break: ordering on score quantized to 1e-9, then docid
    # (identical across Spark / DuckDB / numpy regardless of sum order)
    return (
        agg.select("doc_id", "score")
        .orderBy(F.round(F.col("score"), 9).desc(), F.asc("doc_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Fielded brute force (pages flavor — the reference SERP scorer)
# ---------------------------------------------------------------------------

def bm25_fielded_topk(docs: DataFrame, query: str, k: int = 10,
                      id_col: str = "url", lang: str | None = None,
                      shingles: bool = True, tld_boost: str | None = None,
                      min_should_match: bool = True) -> DataFrame:
    """Reference SERP semantics over extracted docs
    (index=true filter → fielded BM25 + shingle should + optional tld
    match boost → MSM → top-k). Stats are computed per language
    partition, mirroring the reference's one-ES-index-per-language
    layout (document/elasticsearch.go:23-25, 46-58).
    """
    q_tokens = analyze.py_tokens(query)
    q_terms = sorted(set(q_tokens))
    q_bigrams = sorted(set(analyze.py_bigrams(q_tokens)))
    if not q_terms:
        return docs.select(F.col(id_col).alias("doc_id"),
                           F.lit(0.0).alias("score")).limit(0)

    base = docs.where(F.col("index"))  # P1 non-scoring filter
    if lang is not None:
        base = base.where(F.col("lang") == lang)  # partition pruning analog
    base = base.cache()

    n_docs = base.count()
    if n_docs == 0:
        base.unpersist()
        return docs.select(F.col(id_col).alias("doc_id"),
                           F.lit(0.0).alias("score")).limit(0)

    per_field = []
    field_specs = [(f, b, q_terms, False) for f, b in SCORING_FIELDS]
    if shingles and q_bigrams:
        field_specs += [(f, b, q_bigrams, True) for f, b in SHINGLE_FIELDS]

    for fname, boost, terms, is_shingle in field_specs:
        tok_col = analyze.tokens(F.col(fname))
        if is_shingle:
            tok_col = analyze.bigrams(tok_col)
        toks = base.select(F.col(id_col).alias("doc_id"), tok_col.alias("toks"))
        avg_stats = toks.agg(F.avg(F.size("toks")).alias("avgdl"))
        tf = (
            toks.select("doc_id", F.size("toks").alias("dl"),
                        F.explode("toks").alias("term"))
            .where(F.col("term").isin(list(terms)))
            .groupBy("doc_id", "term", "dl")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        scored = (
            tf.join(F.broadcast(dfreq), "term")
            .crossJoin(F.broadcast(avg_stats))
            .withColumn(
                "idf",
                F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
            )
            .withColumn(
                "tscore",
                F.lit(boost) * F.col("idf") * F.col("tf") * (K1 + 1.0)
                / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))),
            )
            .select("doc_id",
                    (F.lit(None).cast("string") if is_shingle else F.col("term")).alias("m_term"),
                    "tscore")
        )
        per_field.append(scored)

    allf = per_field[0]
    for other in per_field[1:]:
        allf = allf.unionByName(other)

    agg = allf.groupBy("doc_id").agg(
        F.sum("tscore").alias("score"),
        F.countDistinct("m_term").alias("n_matched"),
    )
    if min_should_match:
        agg = agg.where(F.col("n_matched") >= msm_required(len(q_terms)))

    if tld_boost and tld_boost not in ("us", "tv", "me", "co", "io"):
        # regional should-clause (search/elasticsearch.go:52-57): a
        # matching tld adds a BM25 term-match on the tld keyword field
        tldf = base.groupBy("tld").agg(F.countDistinct(id_col).alias("df"))
        tld_rows = {r["tld"]: r["df"] for r in tldf.collect()}
        if tld_boost in tld_rows:
            t_idf = idf(n_docs, tld_rows[tld_boost])
            t_score = tf_norm(1.0, 1.0, 1.0) * t_idf
            bonus = base.where(F.col("tld") == tld_boost).select(
                F.col(id_col).alias("doc_id"), F.lit(t_score).alias("bonus"))
            agg = (agg.join(bonus, "doc_id", "left")
                   .withColumn("score", F.col("score") + F.coalesce(F.col("bonus"), F.lit(0.0)))
                   .drop("bonus"))

    out = (agg.select("doc_id", "score")
           .orderBy(F.round(F.col("score"), 9).desc(), F.asc("doc_id"))
           .limit(k))
    return out
