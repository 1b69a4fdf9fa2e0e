"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k against one query vector —
  entirely JVM-side (zip_with/aggregate, codegen), the correctness
  baseline. One scan, no shuffle except the final TakeOrdered.
- ``cosine_pairs``: exact all-pairs above a similarity threshold
  (bounded scopes only).
- ``rp_lsh_buckets`` / ``ann_topk_lsh``: random-hyperplane (SimHash
  for vectors) LSH — the scale path. Signatures are computed in one
  vectorized numpy kernel; search probes only buckets within a small
  Hamming radius of the query's signature, so the candidate set is a
  tiny fraction of the corpus. Recall/latency trade via n_bits and
  probe radius; exactness is NOT claimed (tests measure recall vs the
  brute-force baseline).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import ensure_shipped


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                tie_round: int | None = None) -> DataFrame:
    """Exact cosine top-k vs one query vector; (id, cosine).

    ``tie_round`` quantizes the ORDERING key to that many decimals
    (value column unchanged) — pass 9 to reproduce a SQL oracle's
    (round(cos, 9) DESC, id) tie-break exactly, so sub-1e-9 cosine
    differences cannot select a different rank-k id than DuckDB."""
    q = F.transform(F.lit(query_vec), lambda x: x.cast("double"))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # sequential (left-to-right) accumulation — bit-identical to the
    # SQL oracle's list_dot_product, unlike np.dot's pairwise sum
    acc = 0.0
    for x in query_vec:
        acc += float(x) * float(x)
    qn = float(np.sqrt(acc))
    cos = _dot(v, q) / (_norm(v) * F.lit(qn))
    key = (F.round(F.col("cosine"), tie_round) if tie_round is not None
           else F.col("cosine"))
    return (
        emb.select(F.col(id_col).alias("id"), cos.alias("cosine"))
        .where(F.col("cosine").isNotNull())
        .orderBy(F.desc(key), F.asc("id"))
        .limit(k)
    )


def cosine_pairs(emb: DataFrame, threshold: float = 0.95,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact near-dup pairs by cosine ≥ threshold (O(n²) — small scopes
    or within LSH buckets only)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("id"), v.alias("v"),
                      _norm(v).alias("nrm"))
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", _dot(F.col("a.v"), F.col("b.v"))
                    / (F.col("a.nrm") * F.col("b.nrm")))
        .where(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def rp_lsh_buckets(emb: DataFrame, dim: int, n_bits: int = 10,
                   n_tables: int = 8, seed: int = 42,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, table, bucket) — multi-table random-hyperplane LSH, one
    vectorized Arrow kernel (numpy matmul over the whole batch, all
    tables at once). Multi-table is the standard recall lever: a pair
    is a candidate if it collides in ANY table."""
    import pandas as pd

    ensure_shipped(emb.sparkSession)
    H = _hyperplanes(dim, n_bits, n_tables, seed)
    powers = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))

    def _sig(batch_iter):
        for pdf in batch_iter:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "table": [], "bucket": []})
                continue
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            ids = np.repeat(pdf["id"].values, n_tables)
            tables = np.tile(np.arange(n_tables), len(pdf))
            # (rows, tables, bits) sign matrix in one einsum
            bits = np.einsum("rd,tbd->rtb", mat, H) > 0
            buckets = (bits.astype(np.uint64) * powers[None, None, :]).sum(axis=2)
            yield pd.DataFrame({"id": ids, "table": tables,
                                "bucket": buckets.reshape(-1).astype(np.int64)})

    src = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return src.mapInPandas(_sig, schema="id long, table int, bucket long")


def query_buckets(query_vec, n_bits: int = 10, n_tables: int = 8,
                  seed: int = 42, probe_hamming: int = 1) -> list[tuple[int, int]]:
    """(table, bucket) probes for a query vector (radius ≤ probe_hamming)."""
    dim = len(query_vec)
    H = _hyperplanes(dim, n_bits, n_tables, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    probes = []
    for t in range(n_tables):
        bits = (H[t] @ q) > 0
        sig = int((bits.astype(np.uint64)
                   << np.arange(n_bits, dtype=np.uint64)).sum())
        probes.append((t, sig))
        if probe_hamming >= 1:
            for i in range(n_bits):
                probes.append((t, sig ^ (1 << i)))
    return probes


def ann_topk_lsh(emb: DataFrame, query_vec: list[float], k: int = 10,
                 n_bits: int = 10, n_tables: int = 8, probe_hamming: int = 1,
                 seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: union of same-bucket candidates across all
    tables (± probe radius), exact cosine inside the candidate set.

    At scale the (table, bucket) layout is the partition key of a
    precomputed LSH table; this function recomputes it inline for
    self-contained use."""
    buckets = rp_lsh_buckets(emb, len(query_vec), n_bits, n_tables, seed,
                             id_col, vec_col)
    probes = query_buckets(query_vec, n_bits, n_tables, seed, probe_hamming)
    probe_df = buckets.sparkSession.createDataFrame(
        probes, "table int, bucket long")
    cand_ids = (buckets.join(F.broadcast(probe_df), ["table", "bucket"])
                .select("id").distinct())
    cands = emb.join(cand_ids.withColumnRenamed("id", id_col), id_col, "inner")
    return cosine_topk(cands, query_vec, k, id_col, vec_col)


def cosine_near_dup_lsh(emb: DataFrame, threshold: float = 0.9,
                        n_bits: int = 10, n_tables: int = 8, seed: int = 42,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        max_bucket_size: int | None = 10_000) -> DataFrame:
    """Embedding near-dup PAIRS at scale: candidate pairs are generated
    only inside shared (table, bucket) LSH cells — sub-quadratic, the
    same banding idea as minhash_lsh_pairs — then verified with the
    exact cosine, so every emitted pair is true (≥ threshold); only
    recall is approximate (two near-dups that collide in NO table are
    missed; n_tables is the recall lever — random-hyperplane collision
    probability per table is (1 - θ/π)^n_bits, θ = angle).

    ``max_bucket_size`` bounds the quadratic blow-up of degenerate
    cells (e.g. a zero-vector pile-up or a dense cluster): oversized
    buckets are dropped from candidate generation, their members still
    pair through the other tables. Returns (id_a, id_b, cosine),
    id_a < id_b, exact cosine values.
    """
    spark = emb.sparkSession
    # dim from the first NON-NULL vector (a nullable embedding column's
    # first stored row may be NULL — cosine_topk tolerates those, the
    # pair path must too); NULL-vector rows can't near-dup anything
    emb = emb.where(F.col(vec_col).isNotNull())
    first = emb.select(vec_col).first()
    if first is None:
        return spark.createDataFrame(
            [], "id_a long, id_b long, cosine double")
    dim = len(first[0])
    buckets = rp_lsh_buckets(emb, dim, n_bits, n_tables, seed,
                             id_col, vec_col)
    if max_bucket_size:
        big = (buckets.groupBy("table", "bucket")
               .agg(F.count(F.lit(1)).alias("__sz"))
               .where(F.col("__sz") > max_bucket_size))
        buckets = buckets.join(F.broadcast(big.select("table", "bucket")),
                               ["table", "bucket"], "left_anti")
    cand = (buckets.alias("a").join(
        buckets.alias("b"),
        (F.col("a.table") == F.col("b.table"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct())
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("id"), v.alias("v"),
                      _norm(v).alias("nrm"))
    return (cand
            .join(base.selectExpr("id AS id_a", "v AS va", "nrm AS na"), "id_a")
            .join(base.selectExpr("id AS id_b", "v AS vb", "nrm AS nb"), "id_b")
            .withColumn("cosine", _dot(F.col("va"), F.col("vb"))
                        / (F.col("na") * F.col("nb")))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse quantizer + probed lists
# ---------------------------------------------------------------------------

def ivf_centroids(emb: DataFrame, n_lists: int = 16, train_size: int = 2048,
                  iters: int = 10, seed: int = 42,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample.

    At 10^12 rows the quantizer is always trained on a sample (FAISS
    does the same); the deterministic sample here is the first
    ``train_size`` rows by id. Returns (n_lists, dim) unit centroids.
    """
    rows = (emb.orderBy(id_col).limit(train_size)
            .select(vec_col).collect())
    if not rows:
        return np.zeros((0, 0))
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(len(C)):
            m = X[assign == j]
            if len(m):
                c = m.mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def ivf_assign(emb: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, list_id) via nearest-centroid assignment — one vectorized
    Arrow batch kernel, no shuffle. At scale ``list_id`` becomes the
    partition column of the materialized IVF table, so probing reads
    only n_probe/n_lists of the data (partition pruning)."""
    import pandas as pd

    ensure_shipped(emb.sparkSession)
    C = centroids.astype(np.float64)

    def _assign(batch_iter):
        for pdf in batch_iter:
            V = np.array(pdf["v"].tolist(), dtype=np.float64)
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame({"id": pdf["id"],
                                "list_id": (V @ C.T).argmax(axis=1)})

    src = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return src.mapInPandas(_assign, schema="id long, list_id int")


def ann_topk_ivf(emb: DataFrame, query_vec: list[float], k: int = 10,
                 n_lists: int = 16, n_probe: int = 4,
                 train_size: int = 2048, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 centroids: np.ndarray | None = None,
                 assigned: DataFrame | None = None) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest inverted
    lists, exact cosine inside them (FAISS IVFFlat shape). With
    ``n_probe == n_lists`` this degenerates to the exact scan (tested).
    Recall/latency trades via (n_lists, n_probe); exactness is NOT
    claimed — tests measure recall vs ``cosine_topk``.

    Self-contained calls retrain the quantizer and re-assign inline —
    fine for one-offs, but the scale pattern is: ``ivf_centroids``
    once, materialize ``ivf_assign`` output partitioned by
    ``list_id``, then pass both via ``centroids=``/``assigned=`` so a
    query reads only its probed partitions."""
    C = centroids if centroids is not None else ivf_centroids(
        emb, n_lists, train_size, seed=seed, id_col=id_col, vec_col=vec_col)
    if C.shape[0] == 0:     # empty corpus → empty result, same schema
        return cosine_topk(emb, query_vec, k, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(C @ q))[:n_probe].tolist()
    if assigned is None:
        assigned = ivf_assign(emb, C, id_col, vec_col)
    cand_ids = (assigned.where(F.col("list_id").isin(probe))
                .select("id").withColumnRenamed("id", id_col))
    cands = emb.join(cand_ids, id_col, "inner")
    return cosine_topk(cands, query_vec, k, id_col, vec_col)
