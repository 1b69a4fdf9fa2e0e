"""Top-k BM25 query engine over the compressed inverted index.

Query plan (SURVEY.md §3.1 stages 6-7, re-expressed for Spark):

1. term_stats lookup for the analyzed query terms — bucket-partition
   pruning + term row-group pushdown; |Q| rows to the driver → idf.
2. postings scan filtered to ``bucket IN buckets(Q) AND term IN Q`` —
   Catalyst pushes both into the parquet scan (directory pruning +
   row-group min/max on term), so IO is proportional to the query's
   posting lists, never the corpus.
3. per-shard score kernel (applyInPandas over shard groups — every
   query term's postings for a doc range are co-located by
   construction): vectorized numpy decode + BM25, with optional
   score-neutral **block-max pruning** (WAND-style): a candidate doc
   is exactly scored only if the sum of its terms' block-max upper
   bounds can beat the running top-k threshold obtained from an exact
   first pass over the two strongest terms. Skipped docs provably
   cannot enter the top-k, so WAND on/off is rank-identical (gate in
   tests).
4. global top-k: union of per-shard top-ks → TakeOrderedAndProject
   (no global sort).

The per-query latency path touches only: 1 driver lookup (|Q| rows),
1 pruned postings scan, S kernel tasks, 1 tiny merge.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import analyze, bm25, codec
from .index import Manifest
from .session import ensure_shipped


def analyze_query(man: Manifest, query: str) -> list[str]:
    """Tokenize a query with the SAME chain the index was built with
    (manifest-pinned analyzer — rank identity requires one spec)."""
    an = man.params.get("analyzer", "standard")
    if an == "standard":
        return analyze.py_tokens(query)
    from . import analyze_lang
    # an index built under a different pinned lang profile would be
    # silently unsearchable (doc tokens ≠ query tokens) — fail loudly.
    # "" (a pre-versioning manifest) is ALSO a mismatch: every lang
    # index built before profile recording used the v1 ASCII tokenizer
    # this chain replaced, so accepting it silently would reproduce
    # exactly the failure mode this guard exists to prevent.
    prof = man.params.get("analyzer_profile", "")
    if prof != analyze_lang.LANG_PROFILE:
        raise ValueError(
            f"index was built with analyzer profile "
            f"{prof or '(pre-versioning, lang-v1)'!r}; this build "
            f"analyzes queries with {analyze_lang.LANG_PROFILE!r} — "
            "rebuild the index or pin the matching version")
    return analyze_lang.py_tokens_lang(query, an)


class IndexReader:
    """Handle on an on-disk index (paths + manifest + cached stats)."""

    def __init__(self, spark, root: str):
        self.spark = spark
        self.root = root
        self.man = Manifest.load(root)
        if self.man is None or not self.man.done:
            raise ValueError(f"no complete index at {root}")
        self.n_buckets = self.man.params["n_buckets"]
        self.postings = spark.read.parquet(f"{root}/postings")
        self.term_stats = spark.read.parquet(f"{root}/term_stats")
        self._df_cache: dict[str, int] = {}
        ensure_shipped(spark)

    def buckets_of(self, terms: list[str]) -> list[int]:
        # driver-side Spark-compatible murmur3 — no job per query
        from .hashing import term_bucket
        return sorted({term_bucket(t, self.n_buckets) for t in terms})

    def stats_for(self, terms: list[str]) -> dict[str, int]:
        # per-term df memoized: a repeated term costs zero Spark jobs
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            bks = self.buckets_of(missing)
            rows = (self.term_stats
                    .where(F.col("bucket").isin(bks) & F.col("term").isin(missing))
                    .select("term", "df").collect())
            found = {r["term"]: r["df"] for r in rows}
            for t in missing:
                self._df_cache[t] = int(found.get(t, 0))
        return {t: self._df_cache[t] for t in terms if self._df_cache[t] > 0}


def bm25_topk_indexed(reader: IndexReader, query: str, k: int = 10,
                      use_wand: bool = True,
                      min_should_match: bool = False,
                      offset: int = 0) -> DataFrame:
    """Top-k over the compressed index; returns (docid, score).

    ``offset`` pages past the first ``offset`` ranks (the reference's
    Fetch(number, offset) — search/elasticsearch.go:29,66; page math in
    paging.offset_for): kernels fetch top-(offset+k) per shard, the
    global merge then skips ``offset`` rows — no rescan per page.
    """
    q_terms = sorted(set(analyze_query(reader.man, query)))
    spark = reader.spark
    empty = spark.createDataFrame([], "docid long, score double")
    if not q_terms:
        return empty

    dfs = reader.stats_for(q_terms)
    present = [t for t in q_terms if t in dfs]
    if not present:
        return empty
    n_docs, avgdl = reader.man.n_docs, reader.man.avgdl
    k1, b = reader.man.params["k1"], reader.man.params["b"]
    idf = {t: bm25.idf(n_docs, dfs[t]) for t in present}
    req = bm25.msm_required(len(q_terms)) if min_should_match else 0

    bks = reader.buckets_of(present)
    blocks = (reader.postings
              .where(F.col("bucket").isin(bks) & F.col("term").isin(present))
              .select("term", "shard", "block_id", "first_docid", "last_docid",
                      "n_docs", "max_score_ub", "deltas", "tfs", "dls"))

    idf_b = idf  # closure
    wand = use_wand
    kk = k + max(0, offset)   # ranks ≤ offset+k live in per-shard top-(offset+k)

    def _score_shard(pdf):
        import pandas as pd
        out_doc, out_score = _score_shard_np(pdf, idf_b, k1, b, avgdl, kk, req, wand)
        return pd.DataFrame({"docid": out_doc, "score": out_score})

    per_shard = blocks.groupBy("shard").applyInPandas(
        _score_shard, schema="docid long, score double")

    out = per_shard.orderBy(F.round(F.col("score"), 9).desc(), F.asc("docid"))
    if offset > 0:
        out = out.offset(offset)
    return out.limit(k)


def _decode_term_arrays(pdf, idf: dict, k1: float, b: float,
                        avgdl: float) -> dict:
    """Decode a shard's blocks into per-term posting arrays with
    precomputed BM25 contributions (idf is per-term, so the arrays are
    shared by every query touching the term)."""
    terms = {}
    # shard ranges partition the docid space in shard order, so sorting
    # (term, shard, block_id) yields globally docid-sorted postings —
    # the same code path serves one shard (Spark kernel) or the whole
    # index (serving tier). Impact-prefix rows (block_id < 0) are a
    # redundant reordering of the docid blocks — drop them here.
    if (pdf["block_id"].values < 0).any():
        pdf = pdf[pdf["block_id"].values >= 0]
    keys = (["term", "shard", "block_id"] if "shard" in pdf.columns
            else ["term", "block_id"])
    pdf = pdf.sort_values(keys, kind="mergesort")
    for term, g in pdf.groupby("term", sort=True):
        ubs = g["max_score_ub"].values
        firsts = g["first_docid"].values
        d, t, l = codec.decode_blocks_concat(
            g["deltas"].tolist(), g["tfs"].tolist(), g["dls"].tolist(),
            g["n_docs"].values)
        t = t.astype(np.float64)
        l = l.astype(np.float64)
        w = idf[term]
        scores = w * t * (k1 + 1.0) / (t + k1 * (1.0 - b + b * l / max(avgdl, 1e-9)))
        terms[term] = {
            "docids": d, "scores": scores, "block_ub": ubs,
            "block_first": firsts, "max_ub": float(ubs.max()),
        }
    return terms


def _score_shard_np(pdf, idf: dict, k1: float, b: float, avgdl: float,
                    k: int, msm_req: int, use_wand: bool,
                    stats: dict | None = None):
    """Vectorized per-shard kernel. Returns (docids, scores) of the
    local top-k (score-neutral under pruning).

    With ``use_wand`` the lazy block-max kernel runs: blocks are
    decoded only when an interval's upper bound can still beat the
    running top-k threshold, so head-term cost is sublinear in df
    (true DAAT-style in-list skipping, at block granularity). Without
    it, every block decodes and every candidate is scored exactly —
    the oracle the rank-identity gates compare against.
    """
    if use_wand:
        tb = _term_block_meta(pdf, idf)
        return _topk_blockmax_lazy(tb, k, msm_req, k1, b, avgdl, stats=stats)
    terms = _decode_term_arrays(pdf, idf, k1, b, avgdl)
    return _topk_from_terms(terms, k, msm_req, use_wand)


class _LazyBytes:
    """Sequence view over an Arrow binary column: block bytes are
    materialized per ordinal at decode time. The serving cold path
    decodes a fraction of the blocks it reads bounds for (prefix-TA:
    ~a third), so eagerly converting every row's compressed bytes to
    Python objects (what ``to_pandas``+``tolist`` did) paid for
    postings that never decode; bulk paths (__iter__, the brute
    oracle) still convert in one ``to_pylist`` call."""
    __slots__ = ("_a",)

    def __init__(self, arr):
        self._a = arr

    def __len__(self):
        return len(self._a)

    def __getitem__(self, i):
        return self._a[i].as_py()

    def __iter__(self):
        return iter(self._a.to_pylist())

    def take(self, idxs) -> list:
        """Bulk materialize many ordinals in one Arrow call (the
        block-batch decode path)."""
        return self._a.take(idxs).to_pylist()


def _term_block_meta_arrow(tbl, idf: dict) -> dict:
    """Arrow-native _term_block_meta (same output contract): sorts and
    groups with Arrow compute + numpy run boundaries, and leaves the
    compressed block bytes as _LazyBytes column slices — the serving
    tiers pass the pruned parquet read straight in, skipping the
    pandas conversion entirely."""
    import pyarrow.compute as pc
    has_shard = "shard" in tbl.column_names
    neg_mask = pc.less(tbl["block_id"], 0)
    imp_t = tbl.filter(neg_mask) if pc.any(neg_mask).as_py() else None
    reg_t = tbl.filter(pc.invert(neg_mask)) if imp_t is not None else tbl

    def _groups(t, blk_order):
        keys = ([("term", "ascending")]
                + ([("shard", "ascending")] if has_shard else [])
                + [("block_id", blk_order)])
        t = t.sort_by(keys).combine_chunks()
        enc = pc.dictionary_encode(t["term"].combine_chunks())
        codes = enc.indices.to_numpy()
        names = enc.dictionary.to_pylist()
        change = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [codes.size]]).astype(np.int64)
        cols = {c: t[c].to_numpy(zero_copy_only=False)
                for c in ("first_docid", "last_docid", "n_docs",
                          "max_score_ub")}
        cols["shard"] = (t["shard"].to_numpy(zero_copy_only=False)
                        if has_shard else np.zeros(codes.size,
                                                   dtype=np.int64))
        byt = {c: t[c].combine_chunks()
               for c in ("deltas", "tfs", "dls")}
        for si, ei in zip(starts.tolist(), ends.tolist()):
            yield names[int(codes[si])], slice(si, ei), cols, byt

    out = {}
    # regular rows ascending block_id (docid order)
    for term, sl, cols, byt in _groups(reg_t, "ascending"):
        n = sl.stop - sl.start
        out[term] = {
            "first": cols["first_docid"][sl].astype(np.int64),
            "last": cols["last_docid"][sl].astype(np.int64),
            "nd": cols["n_docs"][sl].astype(np.int64),
            "ub": cols["max_score_ub"][sl].astype(np.float64),
            "bshard": cols["shard"][sl].astype(np.int64),
            "deltas": _LazyBytes(byt["deltas"].slice(sl.start, n)),
            "tfs": _LazyBytes(byt["tfs"].slice(sl.start, n)),
            "dls": _LazyBytes(byt["dls"].slice(sl.start, n)),
            "w": idf[term],
            "nd_total": int(cols["n_docs"][sl].sum()),
        }
    if imp_t is not None and len(imp_t):
        # impact rows: rank = -block_id - 1 ascending ⇔ block_id DESC
        for term, sl, cols, byt in _groups(imp_t, "descending"):
            d = out.get(term)
            if d is None:   # prefix rows imply regular rows; be safe
                continue
            n = sl.stop - sl.start
            d["iub"] = cols["max_score_ub"][sl].astype(np.float64)
            d["ind"] = cols["n_docs"][sl].astype(np.int64)
            d["ishard"] = cols["shard"][sl].astype(np.int64)
            d["ideltas"] = _LazyBytes(byt["deltas"].slice(sl.start, n))
            d["itfs"] = _LazyBytes(byt["tfs"].slice(sl.start, n))
            d["idls"] = _LazyBytes(byt["dls"].slice(sl.start, n))
            d["nd_total"] += int(cols["n_docs"][sl].sum())
    return out


def _term_block_meta(pdf, idf: dict) -> dict:
    """Group a postings frame into per-term RAW block metadata — no
    decode. Sorted (term, shard, block_id) like _decode_term_arrays,
    so each term's block ordinals are docid-ordered and disjoint
    (shard ranges partition the docid space in shard order).
    Accepts a pandas frame (the Spark per-shard kernel's input) or a
    pyarrow Table (the serving tiers' pruned read — dispatched to the
    pandas-free _term_block_meta_arrow).

    Impact-ordered prefix rows (block_id < 0, written by the build when
    a (term, shard) list exceeds ``impact_min`` — index.IndexParams)
    are split into separate per-term arrays (``iub``/``ind``/``ishard``
    /``ideltas``…, sorted (shard, rank) so within a shard chunk k holds
    impact ranks [k·B, (k+1)·B)); the regular docid-block arrays never
    see them, so every existing consumer decodes each posting once."""
    if not hasattr(pdf, "iloc"):    # pyarrow Table
        return _term_block_meta_arrow(pdf, idf)
    keys = (["term", "shard", "block_id"] if "shard" in pdf.columns
            else ["term", "block_id"])
    has_shard = "shard" in pdf.columns
    neg = pdf["block_id"].values < 0
    imp = pdf[neg] if neg.any() else None
    if neg.any():
        pdf = pdf[~neg]
    pdf = pdf.sort_values(keys, kind="mergesort")
    out = {}
    for term, g in pdf.groupby("term", sort=True):
        out[term] = {
            "first": g["first_docid"].values.astype(np.int64),
            "last": g["last_docid"].values.astype(np.int64),
            "nd": g["n_docs"].values.astype(np.int64),
            "ub": g["max_score_ub"].values.astype(np.float64),
            # shard of each regular block — the prefix TA needs it to
            # tell short lists (full blocks generate candidates) from
            # prefix-covered ones (only their top-P chunks do)
            "bshard": (g["shard"].values.astype(np.int64) if has_shard
                       else np.zeros(len(g), dtype=np.int64)),
            "deltas": g["deltas"].tolist(),
            "tfs": g["tfs"].tolist(),
            "dls": g["dls"].tolist(),
            "w": idf[term],
            # total postings across blocks — the serving tiers charge
            # the RAW compressed table against their eviction budget
            # with this (≈2-4 B/posting varint vs 16 B/posting decoded)
            "nd_total": int(g["n_docs"].sum()),
        }
    if imp is not None and len(imp):
        imp = imp.assign(__rank=(-imp["block_id"].values - 1))
        ikeys = (["term", "shard", "__rank"] if has_shard
                 else ["term", "__rank"])
        imp = imp.sort_values(ikeys, kind="mergesort")
        for term, g in imp.groupby("term", sort=True):
            d = out.get(term)
            if d is None:   # prefix rows imply regular rows; be safe
                continue
            d["iub"] = g["max_score_ub"].values.astype(np.float64)
            d["ind"] = g["n_docs"].values.astype(np.int64)
            d["ishard"] = (g["shard"].values.astype(np.int64) if has_shard
                           else np.zeros(len(g), dtype=np.int64))
            d["ideltas"] = g["deltas"].tolist()
            d["itfs"] = g["tfs"].tolist()
            d["idls"] = g["dls"].tolist()
            d["nd_total"] += int(g["n_docs"].sum())
    return out


def _bm25_scores(d: dict, tf: np.ndarray, dl: np.ndarray,
                 k1: float, b: float, avgdl: float) -> np.ndarray:
    """BM25 contributions for one term's decoded postings (w = idf or
    idf×boost pinned on the tb entry; per-key avgdl override honored)."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    ad = d.get("avgdl", avgdl)
    return d["w"] * tf * (k1 + 1.0) / (
        tf + k1 * (1.0 - b + b * dl / max(ad, 1e-9)))


def _ensure_blocks(d: dict, st: dict, ords, k1: float, b: float,
                   avgdl: float) -> int:
    """Decode the given regular-block ordinals of one term into its
    block-granular store entry (segment map). Returns the number of
    NEWLY decoded blocks. Deliberately does NOT maintain a global
    concatenation of everything decoded: rebuilding one after every
    probe batch is O(total decoded) per call — quadratic over a cold
    TA sweep (measured: a 3.4M-doc cold head-2 query spent most of
    its 1.07 s re-concatenating ~900k decoded postings hundreds of
    times). Readers build lookups over exactly the blocks they touch
    (_seg_lookup)."""
    seg = st["seg"]
    new = [int(o) for o in np.unique(ords) if int(o) not in seg]
    if not new:
        return 0
    na = np.asarray(new, dtype=np.int64)
    if hasattr(d["deltas"], "take"):    # _LazyBytes: one Arrow call
        bufs = (d["deltas"].take(na), d["tfs"].take(na),
                d["dls"].take(na))
    else:
        bufs = ([d["deltas"][o] for o in new],
                [d["tfs"][o] for o in new],
                [d["dls"][o] for o in new])
    dd, tf, dl = codec.decode_blocks_concat(*bufs, d["nd"][na])
    sc = _bm25_scores(d, tf, dl, k1, b, avgdl)
    offs = np.concatenate([[0], np.cumsum(d["nd"][na])])
    for i, o in enumerate(new):
        seg[o] = (dd[offs[i]:offs[i + 1]], sc[offs[i]:offs[i + 1]])
    st["np"] += int(d["nd"][na].sum())
    return len(new)


def _seg_lookup(st: dict, ords: np.ndarray):
    """(docids, scores) concatenated over the given DECODED block
    ordinals — ordinal order == docid order (disjoint ranges), so the
    result is docid-sorted. O(blocks touched), not O(blocks decoded)."""
    seg = st["seg"]
    parts = [seg[int(o)] for o in np.unique(ords)]
    if not parts:
        return (np.empty(0, dtype=np.int64), np.empty(0))
    if len(parts) == 1:
        return parts[0]
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]))


def _probe_term(d: dict, st: dict, cand: np.ndarray, k1: float, b: float,
                avgdl: float):
    """Exact contributions of one term for sorted unique ``cand``,
    decoding only the covering blocks and searching only those.
    Returns (contrib, hit, n_new)."""
    if not d["first"].size:
        return np.zeros(cand.size), np.zeros(cand.size, dtype=bool), 0
    j = np.searchsorted(d["first"], cand, side="right") - 1
    jc = np.clip(j, 0, d["first"].size - 1)
    covered = (j >= 0) & (cand <= d["last"][jc])
    if not covered.any():
        return np.zeros(cand.size), np.zeros(cand.size, dtype=bool), 0
    n_new = _ensure_blocks(d, st, jc[covered], k1, b, avgdl)
    cd, cs = _seg_lookup(st, jc[covered])
    pos = np.searchsorted(cd, cand)
    pos_c = np.minimum(pos, cd.size - 1)
    hit = cd[pos_c] == cand
    return np.where(hit, cs[pos_c], 0.0), hit, n_new


# rounding slack: the final rank uses round(score, 9), so an interval is
# only provably useless when its bound is below θ by more than the
# rounding quantum — keeps pruning rank-identical even at round() ties.
_WAND_SLACK = 1e-9


def _pinned_topk(cand: np.ndarray, total: np.ndarray, k: int):
    """Top-k under the pinned (-round(score, 9), docid) rule.

    Thresholds on the rounded scores first (exact: the pool keeps
    every row at/above the k-th rounded score, ties included), so the
    lexsort runs over ~k rows instead of every scored candidate — the
    brute oracle at millions of candidates was one full-array sort."""
    kloc = min(k, cand.size)
    r = np.round(total, 9)
    if cand.size > 4 * k:
        thr = np.partition(r, cand.size - kloc)[cand.size - kloc]
        pool = np.flatnonzero(r >= thr)
        cand, total, r = cand[pool], total[pool], r[pool]
    idx = np.lexsort((cand, -r))[:kloc]
    return cand[idx].astype(np.int64), total[idx]


def _range_max_table(vals: np.ndarray) -> list:
    """Sparse table for O(1) range-max queries: levels[k][i] =
    max(vals[i : i + 2^k]). Built per wave over a term's live block
    bounds (O(B log B), all numpy)."""
    levels = [vals]
    k = 1
    while (1 << k) <= vals.size:
        prev = levels[-1]
        half = 1 << (k - 1)
        levels.append(np.maximum(prev[:-half], prev[half:]))
        k += 1
    return levels


def _range_max(levels: list, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Vectorized max(vals[lo:hi]) per element pair; 0 where empty
    (a non-negative-score context: BM25 contributions are > 0)."""
    out = np.zeros(lo.size)
    n = hi - lo
    nz = n > 0
    if not nz.any():
        return out
    k = np.zeros(lo.size, dtype=np.int64)
    k[nz] = np.floor(np.log2(n[nz])).astype(np.int64)
    for kk in np.unique(k[nz]):
        m = nz & (k == kk)
        lev = levels[kk]
        out[m] = np.maximum(lev[lo[m]], lev[hi[m] - (1 << kk)])
    return out


def _scores_bulk(d: dict, tf: np.ndarray, dl: np.ndarray,
                 k1: float, b: float, avgdl: float) -> np.ndarray:
    """BM25 contributions for a BULK decode (identical values to
    _bm25_scores): when (tf, dl) pack into 32 bits, factorize the
    pairs and evaluate the formula once per DISTINCT pair, then
    gather — tf-norm has few distinct values (tf and dl are small
    ints), so millions of float64 formula passes collapse to a
    lookup. Float results are bit-identical: the same expression runs
    on the same float64 inputs, just once per distinct pair."""
    if tf.size > (1 << 16) and tf.dtype.itemsize <= 2 \
            and (dl.size == 0 or int(dl.max()) < (1 << 16)):
        import pandas as pd
        key = tf.astype(np.uint32) << np.uint32(16)
        key |= dl.astype(np.uint32)
        inv, uniq = pd.factorize(key)
        utf = (uniq >> np.uint32(16)).astype(np.float64)
        udl = (uniq & np.uint32(0xFFFF)).astype(np.float64)
        ad = d.get("avgdl", avgdl)
        g = d["w"] * utf * (k1 + 1.0) / (
            utf + k1 * (1.0 - b + b * udl / max(ad, 1e-9)))
        return g[inv]
    return _bm25_scores(d, tf, dl, k1, b, avgdl)


def _dense_arrays_from_tb(tb: dict, k1: float, b: float, avgdl: float,
                          keys=None) -> dict:
    """Decode EVERY block of the given tb entries into brute-kernel
    arrays ({docids, scores, max_ub}), memoizing the decode on the tb
    entry (``dense``) so callers holding tb (e.g. a serving-tier block
    cache) pay the bulk decode once. Compact decode (minimal dtypes)
    + per-distinct-(tf, dl) score evaluation keep this pass
    memory-bandwidth-lean — it is the dense-merge finisher's main
    cost at millions of postings."""
    dense = {}
    for t in (keys if keys is not None else sorted(tb)):
        d = tb[t]
        full = d.get("dense")
        if full is None:
            dd, tf, dl = codec.decode_blocks_concat(
                d["deltas"], d["tfs"], d["dls"], d["nd"], compact=True)
            sc = _scores_bulk(d, tf, dl, k1, b, avgdl)
            full = (dd, sc)
            d["dense"] = full
        dense[t] = {"docids": full[0], "scores": full[1],
                    "max_ub": float(d["ub"].max()) if d["ub"].size else 0.0}
    return dense


def _topk_blockmax_lazy(tb: dict, k: int, msm_req: int,
                        k1: float, b: float, avgdl: float,
                        stats: dict | None = None,
                        store: dict | None = None,
                        msm_group: dict | None = None,
                        no_cand=None,
                        dense_fn=None):
    """Lazy block-max top-k (score-neutral, rank-identical to brute).

    Vectorized equivalent of DAAT block-max WAND's in-list skipping
    (Ding & Suel, "Faster top-k document retrieval using block-max
    indexes", SIGIR'11), reshaped for batch numpy instead of pointer
    chasing:

    * every unscored doc d in block B of term t obeys
      ``score(d) ≤ ub(B) + Σ_{t'≠t, t' not exhausted} max_ub(t')``
      (an *exhausted* term — all blocks decoded, all docs scored —
      cannot contribute to a doc that is still unscored);
    * blocks are visited in descending order of that bound, in growing
      batches; only visited blocks *generate candidates*, and
      candidates are scored exactly by probing every term with
      decode-on-demand of just the covering blocks;
    * the running k-th best θ retires every remaining block whose
      bound falls below it — those blocks are never decoded.

    Small lists exhaust in the first waves (their blocks carry the
    highest own-ub), which collapses the bound for head-term blocks;
    a head term's tail blocks are then retired wholesale without
    decode — the cost is sublinear in head-term df whenever θ
    separates from the head term's block maxima. A degenerate flat
    corpus (every block bound ≈ θ) cannot skip anything; that regime
    is detected UPFRONT for ≤2-term queries (no block's own bound
    sits below its term's max ⇒ nothing is ever retirable, so the
    kernel goes dense before any wave bookkeeping) and mid-sweep
    otherwise (as soon as θ exists: skippable share of remaining
    blocks < 25% with no imminent list exhaustion) — flat-bound
    queries pay at most one wave of bookkeeping instead of per-wave
    probing over the whole index.

    Generalizations for the serving tiers (all optional, defaults
    reproduce the single-field Spark-kernel semantics):

    * ``store``: a persistent dict {key -> {"seg", "np"}} that
      outlives the call — decoded blocks accumulate across queries
      (the serving tier's block-granular cache), so warm queries
      decode nothing. The caller owns eviction.
    * ``msm_group``: {key -> base term or None} — MSM counts DISTINCT
      non-None groups hit (the fielded cross_fields rule); None keys
      score but never qualify. Default: every key is its own group.
    * ``no_cand``: keys that contribute score and bound but never
      generate candidates (the reference's non-qualifying tld
      should-clause) — their blocks are probe-only.
    * ``dense_fn(dense_arrays)``: the brute kernel the flat-regime
      bailouts delegate to (default ``_topk_impact_ordered``); fielded
      passes its own cross-field scorer. REQUIRED whenever
      ``msm_group``/``no_cand`` are used — the default finisher counts
      every key toward MSM and generates candidates from every list,
      so it would silently diverge from the wave path exactly when the
      data triggers a dense bailout.
    * per-key ``avgdl`` in a tb entry overrides the global (fielded
      sub-indexes each carry their own).
    """
    zero = (np.empty(0, dtype=np.int64), np.empty(0))
    no_cand = no_cand or set()
    terms = sorted(t for t in tb if t not in no_cand)
    extras = sorted(t for t in tb if t in no_cand)
    keys_all = terms + extras
    if not terms:
        return zero
    if msm_group is None:
        grp_of = {t: t for t in terms}          # per-key counting
        grp_of.update({t: None for t in extras})
    else:
        grp_of = msm_group
    default_finisher = dense_fn is None
    if dense_fn is None:
        if msm_group is not None or extras:
            raise ValueError(
                "msm_group/no_cand require an explicit dense_fn: the "
                "default impact-ordered finisher counts every key "
                "toward MSM and generates candidates from every list")
        # flat-regime finisher: impact-ordered TA (early termination by
        # per-doc score spread, which survives the tf-saturation that
        # defeats block-level bounds); memoizes impact permutations on
        # the tb entries so a serving tier's warm queries skip the sort
        dense_fn = lambda dense: _topk_impact_ordered(dense, k, msm_req,  # noqa: E731
                                                      meta=tb)
    nt = len(terms)
    n_keys = len(keys_all)
    dfs_of = np.array([int(tb[t]["nd"].sum()) for t in terms])
    blocks_of = np.array([tb[t]["ub"].size for t in terms])
    offsets = np.concatenate([[0], np.cumsum(blocks_of)])
    blocks_all = int(blocks_of.sum()) + sum(tb[t]["ub"].size for t in extras)

    # ---- flat block table across candidate-generating terms ----
    b_term = np.repeat(np.arange(nt), blocks_of)
    b_ord = np.concatenate([np.arange(n) for n in blocks_of])
    b_ub = np.concatenate([tb[t]["ub"] for t in terms])
    remaining = np.ones(b_term.size, dtype=bool)   # not yet visited/retired
    n_left = blocks_of.copy()                      # unvisited blocks per term
    exhausted = np.zeros(nt, dtype=bool)

    # docid-ALIGNED bound machinery (true block-max WAND, Ding & Suel
    # §4: the other-term contribution to a block's bound is the max ub
    # over that term's blocks OVERLAPPING the block's docid range, not
    # the term's global max — the difference between skipping nothing
    # and skipping almost everything when two head terms rarely
    # co-occur at high tf). ub_live zeroes a block once visited: every
    # doc of a visited block is scored, so an unscored doc's covering
    # block in any key is necessarily unvisited.
    firsts_k = [np.asarray(tb[t]["first"], dtype=np.int64) for t in keys_all]
    lasts_k = [np.asarray(tb[t]["last"], dtype=np.int64) for t in keys_all]
    ub_live = [np.asarray(tb[t]["ub"], dtype=np.float64).copy()
               for t in keys_all]

    # Memoized bound bookkeeping: between waves only the VISITED keys'
    # ub_live changes (visiting zeroes a block's bound; retirement
    # leaves it — retired blocks' unscored docs still back other
    # terms' bounds). So the sparse tables and the per-(ti, kj)
    # overlap-max arrays are cached and rebuilt only for keys marked
    # dirty — per-wave bookkeeping is O(keys visited this wave), not
    # O(all keys × all blocks) (round-3 review finding: the full
    # rebuild dominated exactly the long sweeps skipping is for).
    _tables = [None] * n_keys
    _dirty = [True] * n_keys
    _lohi: dict = {}
    _adds = [[None] * n_keys for _ in range(nt)]

    def compute_prio():
        changed = {kj for kj in range(n_keys) if _dirty[kj]}
        for kj in changed:
            _tables[kj] = (_range_max_table(ub_live[kj])
                           if ub_live[kj].size else None)
            _dirty[kj] = False
        prio = b_ub.copy()
        for ti in range(nt):
            fa, la = firsts_k[ti], lasts_k[ti]
            add = np.zeros(fa.size)
            for kj in range(n_keys):
                if kj == ti:
                    continue
                if _adds[ti][kj] is None or kj in changed:
                    if _tables[kj] is None:
                        _adds[ti][kj] = None   # permanently-empty key
                    else:
                        lh = _lohi.get((ti, kj))
                        if lh is None:   # block ranges are static
                            lo = np.searchsorted(lasts_k[kj], fa,
                                                 side="left")
                            hi = np.searchsorted(firsts_k[kj], la,
                                                 side="right")
                            lh = _lohi[(ti, kj)] = (lo, hi)
                        _adds[ti][kj] = _range_max(_tables[kj], *lh)
                if _adds[ti][kj] is not None:
                    add += _adds[ti][kj]
            prio[offsets[ti]:offsets[ti + 1]] += add
        return prio

    n_decoded = 0

    def go_dense():
        # impact-prefix TA when the index carries prefix chunks (and
        # the caller uses the default single-field semantics): cold
        # cost is O(prefix + candidates), never O(df) — the round-3
        # cold-latency scale fix. Indexes without prefixes (or custom
        # fielded finishers) keep the decode-everything path.
        nonlocal store
        if default_finisher and any(
                tb[t].get("iub") is not None and tb[t]["iub"].size
                for t in keys_all):
            if store is None:
                store = {}
            for t in keys_all:
                store.setdefault(t, {"seg": {}, "np": 0})
            return _topk_impact_prefix(tb, k, msm_req, k1, b, avgdl,
                                       store, stats=stats,
                                       n_base=n_decoded,
                                       blocks_total=blocks_all)
        dense = _dense_arrays_from_tb(tb, k1, b, avgdl, keys=keys_all)
        if stats is not None:
            stats["blocks_decoded"] = blocks_all
            stats["blocks_total"] = blocks_all
            stats["dense_bailout"] = True
        return dense_fn(dense)

    # upfront strictly-flat bailout (≤2 terms): when EVERY block bound
    # is identical (uniform corpora — same tf/dl everywhere), any θ
    # either retires all blocks or none, so the sweep provably cannot
    # separate; go dense before any wave bookkeeping. Spread corpora
    # proceed lazily — the in-loop check (with a REAL θ and aligned
    # bounds) handles the merely-flat-ish regime after one cheap wave.
    if nt <= 2:
        prio0 = compute_prio()
        if prio0.max() - prio0.min() <= _WAND_SLACK:
            return go_dense()

    # ---- lazy decoded-block store (caller-persistent when given) ----
    if store is None:
        store = {}
    for t in keys_all:
        store.setdefault(t, {"seg": {}, "np": 0})

    def ensure(ki, ords):
        nonlocal n_decoded
        n_decoded += _ensure_blocks(tb[keys_all[ki]], store[keys_all[ki]],
                                    ords, k1, b, avgdl)

    def probe(ki, cand):
        """Exact per-key contributions for sorted unique ``cand``,
        decoding only the blocks that cover a candidate."""
        nonlocal n_decoded
        contrib, hit, n_new = _probe_term(tb[keys_all[ki]],
                                          store[keys_all[ki]], cand,
                                          k1, b, avgdl)
        n_decoded += n_new
        return contrib, hit

    # ---- descending-bound wave sweep ----
    got_d, got_s, got_m = [], [], []
    scored = np.empty(0, dtype=np.int64)   # sorted docids scored so far
    n_ok = 0                               # msm-eligible scored so far
    theta = -np.inf
    batch = 8
    while remaining.any():
        if msm_req:
            alive = {grp_of.get(terms[ti]) for ti in range(nt)
                     if not exhausted[ti]}
            alive.discard(None)
            if len(alive) < msm_req:
                break   # docs outside every exhausted list can't reach msm
        prio = compute_prio()
        live = remaining & (prio >= theta - _WAND_SLACK)
        if not live.any():
            break
        # dense bailout: θ exists yet provably retires almost nothing,
        # and no list is close enough to exhaustion for the bounds to
        # collapse soon — the bound distribution is too flat for θ to
        # separate (the brute-force regime). Decode everything and
        # finish with the brute kernel's single vectorized pass: the
        # flat regime then costs one wave of bookkeeping, not per-wave
        # probing over the whole index.
        if np.isfinite(theta):
            n_rem = int(remaining.sum())
            skippable = n_rem - int(live.sum())
            imminent = bool(((n_left > 0) & (n_left <= 2 * batch)
                             & ~exhausted).any())
            if skippable < 0.25 * n_rem and not imminent:
                return go_dense()
        # cheap-exhaust: fully visiting a nearly-done list zeroes its
        # mu, collapsing every other term's bound — the lever that
        # lets a rare strong term stop poisoning head-block bounds
        cheap = [ti for ti in np.argsort(n_left, kind="stable")
                 if 0 < n_left[ti] <= batch]
        take_mask = np.zeros(b_term.size, dtype=bool)
        tot = 0
        for ti in cheap:
            if tot and tot + n_left[ti] > 2 * batch:
                break
            take_mask |= remaining & (b_term == ti)
            tot += int(n_left[ti])
        if tot == 0:
            # priority fill: bound desc, small-df terms first on ties
            idxs = np.flatnonzero(live)
            key = np.lexsort((b_ord[idxs], b_term[idxs],
                              dfs_of[b_term[idxs]], -prio[idxs]))
            take_mask[idxs[key[:batch]]] = True
        take = np.flatnonzero(take_mask)
        remaining[take] = False
        cands = []
        for ti in np.unique(b_term[take]):
            ords = b_ord[take[b_term[take] == ti]]
            ensure(ti, ords)
            t = terms[ti]
            cands.extend(store[t]["seg"][int(o)][0] for o in ords)
            ub_live[ti][ords] = 0.0   # visited: all docs scored
            _dirty[ti] = True         # bound tables stale for this key
            n_left[ti] -= ords.size
            if n_left[ti] == 0:
                exhausted[ti] = True
        cand = _drop_scored(np.unique(np.concatenate(cands)), scored)
        batch = min(batch * 2, 512)
        if cand.size == 0:
            continue
        total = np.zeros(cand.size)
        gm: dict = {}
        for ki in range(len(keys_all)):   # fixed accumulation order
            contrib, hit = probe(ki, cand)
            total += contrib
            g = grp_of.get(keys_all[ki])
            if g is not None:
                m = gm.get(g)
                gm[g] = hit if m is None else (m | hit)
        matched = np.zeros(cand.size, dtype=np.int32)
        for m in gm.values():
            matched += m.astype(np.int32)
        got_d.append(cand)
        got_s.append(total)
        got_m.append(matched)
        scored = np.union1d(scored, cand)
        n_ok += int((matched >= msm_req).sum()) if msm_req else cand.size
        if n_ok >= k:
            alls = np.concatenate(got_s)
            if msm_req:
                allm = np.concatenate(got_m)
                sc_pool = alls[allm >= msm_req]
            else:
                sc_pool = alls
            theta = np.partition(sc_pool, -k)[-k]

    if stats is not None:
        stats["blocks_decoded"] = n_decoded
        stats["blocks_total"] = blocks_all

    if not got_d:
        return zero
    cand = np.concatenate(got_d)
    total = np.concatenate(got_s)
    if msm_req:
        okm = np.concatenate(got_m) >= msm_req
        cand, total = cand[okm], total[okm]
    if cand.size == 0:
        return zero
    return _pinned_topk(cand, total, k)


#: stop margin for the impact-ordered sweep: with θ − T > 2·0.5e-9,
#: round(θ, 9) is STRICTLY greater than round(T, 9), so no unseen doc
#: can displace a result even on a rounded-score tie + docid tie-break.
_TA_SLACK = 2e-9


def _topk_impact_ordered(dense: dict, k: int, msm_req: int,
                         meta: dict | None = None):
    """Exact top-k over fully-decoded term arrays via Fagin's
    threshold algorithm (TA): each term's postings are visited in
    DESCENDING score order (impact order), candidates are scored
    exactly against every term, and the sweep stops once the k-th
    best exact score provably beats the bound T = Σ per-term next
    unseen score — the regime block-max skipping cannot help with
    (BM25 tf-saturation makes every block bound ≈ the term max for
    head terms, but per-DOC impacts still spread via dl
    normalization). Rank-identical to the brute kernel: unseen docs
    are excluded only when round(θ,9) > round(T,9) is guaranteed
    (_TA_SLACK). Falls back to the brute single pass if 25% of all
    postings are consumed without separation (degenerate uniform
    corpora, where nothing separates anything).

    ``meta``: optional {term: dict} whose entries memoize the impact
    permutation across calls (the serving tier passes the cached tb
    entries, so warm queries skip the argsort too).
    """
    names = sorted(dense)
    if not names:
        return np.empty(0, dtype=np.int64), np.empty(0)
    orders = {}
    for t in names:
        m = meta.get(t) if meta else None
        order = m.get("impact_order") if m is not None else None
        if order is None:
            order = np.argsort(-dense[t]["scores"], kind="stable")
            if m is not None:
                m["impact_order"] = order
        orders[t] = order

    def exact_scores(cand):
        return _exact_scores_over(dense, names, cand)

    sizes = {t: dense[t]["docids"].size for t in names}
    total_postings = sum(sizes.values())
    pos = {t: 0 for t in names}
    got_d, got_s, got_m = [], [], []
    scored = np.empty(0, dtype=np.int64)
    n_ok, theta, chunk, consumed = 0, -np.inf, 1024, 0
    while True:
        heads = [dense[t]["scores"][orders[t][pos[t]]]
                 for t in names if pos[t] < sizes[t]]
        if not heads:
            break
        T = float(np.sum(heads))
        if n_ok >= k and theta - T > _TA_SLACK:
            break
        if consumed > 0.25 * total_postings:
            # no separation — finish with the vectorized scatter-merge
            # over the (already decoded) arrays; θ is a valid lower
            # bound for its pool extraction, and the merge's complete
            # exact totals supersede the partial got_* pools
            return _topk_dense_merge(dense, k, msm_req, theta=theta)
        cands = []
        for t in names:
            lo = pos[t]
            hi = min(lo + chunk, sizes[t])
            if hi > lo:
                cands.append(dense[t]["docids"][orders[t][lo:hi]])
                consumed += hi - lo
                pos[t] = hi
        cand = _drop_scored(np.unique(np.concatenate(cands)), scored)
        chunk = min(chunk * 2, 65536)
        if cand.size == 0:
            continue
        tot, mat = exact_scores(cand)
        got_d.append(cand)
        got_s.append(tot)
        got_m.append(mat)
        scored = np.union1d(scored, cand)
        n_ok += int((mat >= msm_req).sum()) if msm_req else cand.size
        if n_ok >= k:
            alls = np.concatenate(got_s)
            if msm_req:
                allm = np.concatenate(got_m)
                pool = alls[allm >= msm_req]
            else:
                pool = alls
            theta = np.partition(pool, -k)[-k]

    if not got_d:
        return np.empty(0, dtype=np.int64), np.empty(0)
    cand = np.concatenate(got_d)
    total = np.concatenate(got_s)
    if msm_req:
        okm = np.concatenate(got_m) >= msm_req
        cand, total = cand[okm], total[okm]
    if cand.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    return _pinned_topk(cand, total, k)


#: candidate-flood threshold that flips the prefix-TA sweep into the
#: vectorized dense merge: a sweep that has consumed this many
#: candidates without terminating is in the regime where the NRA bound
#: cannot separate (≥3 independent dense terms — an unseen doc holding
#: every term is always possible until the lists exhaust), so finishing
#: exhaustively-but-vectorized is strictly cheaper than continuing to
#: probe per candidate batch.
_DENSE_MERGE_CANDS = 49152
#: probe-flood leg of the same detector: flip once random-access
#: probing has decoded this share of all blocks (plus an absolute
#: floor so small indexes never flip) — the flood is decode-everything
#: in disguise, paid with per-round overhead on top
_DENSE_MERGE_BLOCK_FRAC = 0.2
_DENSE_MERGE_MIN_BLOCKS = 1500


def _topk_dense_merge(dense: dict, k: int, msm_req: int,
                      theta: float = -np.inf):
    """Exhaustive vectorized finisher for the all-dense multi-term
    regime (round-4 verdict ask #1 — the 5-term stress used to decode
    95% of blocks AND then pay the per-candidate probe machinery over
    millions of candidates).

    One pass, no per-candidate work: per-term scatter-add of decoded
    scores into a dense docid-span array (each docid appears at most
    once per term, so the scatter is exact placement, and the
    cross-term accumulation runs elementwise in sorted-key order —
    adding 0.0 for absent terms is an IEEE identity, so totals are
    float-bit-identical to the brute per-candidate accumulation rule),
    plus an int scatter for msm counts. Top-k selection partitions on
    round(score, 9) and resolves the boundary with the pinned
    (-rounded, docid) lexsort over the ≥-threshold pool only — the
    same result set as a full-array lexsort. Sparse/re-id'd docid
    spaces fall back to a (docid, term-position) lexsort + segmented
    reduceat, which preserves the same per-doc accumulation order.

    Cost: O(total postings) decode (batched varint —
    codec.decode_blocks_concat) + O(span) scatter + O(n) partition —
    independent of k's convergence behavior, which is what bounds the
    cold path when every pruning bound is flat."""
    zero = (np.empty(0, dtype=np.int64), np.empty(0))
    names = sorted(dense)
    parts = [dense[t] for t in names if dense[t]["docids"].size]
    if not parts:
        return zero
    total_np = sum(p["docids"].size for p in parts)
    lo = min(int(p["docids"].min()) for p in parts)
    hi = max(int(p["docids"].max()) for p in parts)
    span = hi - lo + 1
    if span <= max(4 * total_np, 1 << 22):
        tot = np.zeros(span)
        for p in parts:
            d = p["docids"] if lo == 0 else p["docids"] - lo
            tot[d] += p["scores"]
        if msm_req > 1:
            cnt = np.zeros(span, dtype=np.int32)
            for p in parts:
                d = p["docids"] if lo == 0 else p["docids"] - lo
                cnt[d] += 1
            tot[cnt < msm_req] = 0.0    # BM25 scores are > 0: 0 ⇔ out
        # threshold FIRST on the span array (absent docs sit at 0, and
        # k ≪ matching docs, so the k-th largest is > 0): extracting
        # only the ≥-threshold pool avoids materializing per-doc
        # arrays for millions of matches. ``theta`` (the caller's
        # running k-th-best LOWER bound — ≥ k docs have totals ≥ θ by
        # construction) skips even the partition pass; otherwise the
        # k-th largest raw total is found by one np.partition. The
        # _TA_SLACK margin keeps the pool a superset of every doc
        # that can still win a rounded-score tie (round(x, 9) of
        # anything below thr − slack is STRICTLY below the k pool
        # members' rounded scores). thr at/below the slack (fewer
        # than k eligible docs) falls back to full extraction.
        if np.isfinite(theta) and theta > _TA_SLACK:
            thr = float(theta)
        else:
            kq = min(k, span)
            thr = float(np.partition(tot, span - kq)[span - kq])
        if thr > _TA_SLACK:
            live = np.flatnonzero(tot >= thr - _TA_SLACK)
            if live.size < k:       # θ was above the true k-th: widen
                kq = min(k, span)
                thr = float(np.partition(tot, span - kq)[span - kq])
                live = (np.flatnonzero(tot >= thr - _TA_SLACK)
                        if thr > _TA_SLACK else np.flatnonzero(tot > 0.0))
        else:
            live = np.flatnonzero(tot > 0.0)
        if live.size == 0:
            return zero
        cand = (live + lo).astype(np.int64)
        total = tot[live]
    else:
        # sparse/re-id'd docid space: compact the ids with np.unique,
        # then run the SAME per-term sequential scatter as the span
        # branch into the compacted array — np.add.reduceat is NOT
        # usable here (it sums segments pairwise, which breaks the
        # strict sorted-term-order float accumulation the rank rule
        # pins; caught by the dense-merge unit gates)
        dd = np.concatenate([p["docids"] for p in parts])
        cand, inv = np.unique(dd, return_inverse=True)
        total = np.zeros(cand.size)
        cnt = np.zeros(cand.size, dtype=np.int32)
        o = 0
        for p in parts:
            sl = inv[o:o + p["docids"].size]
            total[sl] += p["scores"]
            cnt[sl] += 1
            o += p["docids"].size
        if msm_req:
            m = cnt >= msm_req
            cand, total = cand[m], total[m]
        cand = cand.astype(np.int64)
        if cand.size == 0:
            return zero
    kloc = min(k, cand.size)
    r = np.round(total, 9)
    if cand.size > 4 * k:
        thr = np.partition(r, cand.size - kloc)[cand.size - kloc]
        pool = np.flatnonzero(r >= thr)     # ⊇ the true top-k incl. ties
        cand, total, r = cand[pool], total[pool], r[pool]
    idx = np.lexsort((cand, -r))[:kloc]
    return cand[idx], total[idx]


def _topk_impact_prefix(tb: dict, k: int, msm_req: int,
                        k1: float, b: float, avgdl: float,
                        store: dict, stats: dict | None = None,
                        n_base: int = 0, blocks_total: int | None = None):
    """Flat-bound-regime finisher over an index with impact-ordered
    prefixes (index.IndexParams.impact_prefix) — the cold-latency
    scale path.

    The dense→TA bailout used to decode EVERY block of every query
    term before running the impact-ordered TA (O(df) cold cost —
    linear in head-term df, the round-3 VERDICT's one genuine
    100×-scale latency risk). This variant runs the same TA/NRA sweep
    (Fagin et al., "Optimal aggregation algorithms for middleware",
    PODS'01) directly over build-time impact-ordered prefix chunks —
    Lucene's impact-sorted postings analog (public Lucene 8
    ImpactsEnum design):

    * candidate units per term = its prefix chunks (top-P postings of
      each long (term, shard) list, score-descending across chunks)
      plus the FULL docid blocks of lists short enough to carry no
      prefix (≤ impact_min postings — already O(prefix)-cheap);
    * decoded units feed a per-term score-descending POSTING stream;
      candidates are drawn a few postings at a time (batch doubling),
      so the number of exact-scored candidates — and with it the
      random-access probe cost — grows with what θ actually needs,
      not with the 128-posting chunk granularity;
    * candidates are scored EXACTLY by probing every term with
      decode-on-demand of just the covering docid blocks (shared
      block store — warm queries decode nothing);
    * unseen docs are bounded by T = Σ_t max(stream head, next
      unvisited unit's ub, tail floor), where the tail floor for a
      prefix-exhausted shard is the min score of its deepest chunk
      (every posting beyond the prefix scores ≤ the P-th impact by
      construction) — tightened from that chunk's ub once it decodes;
    * stop when the k-th best exact score beats T by _TA_SLACK (the
      same round(·,9) rank-identity argument as _topk_impact_ordered).

    Cold cost: O(prefix-chunks touched + candidates·|Q|) decoded
    blocks, independent of head-term df. Degenerate corpora whose
    prefixes never separate (uniform scores) fall back to
    decode-everything ONCE — exactly today's behavior, documented.
    """
    zero = (np.empty(0, dtype=np.int64), np.empty(0))
    terms = sorted(tb)
    if not terms:
        return zero
    n_pref = 0
    n_reg = n_base

    units = {}
    for t in terms:
        d = tb[t]
        st = store[t]
        st.setdefault("iseg", {})
        # CUMULATIVE per-term TA state, memoized across calls on the
        # persistent block store (the serving tier's warm-query lever:
        # a repeat query re-consumes the memoized score-desc stream
        # with a fresh pointer — zero decodes, zero merges):
        #   d/s  — all folded units' postings, (score desc, docid asc)
        #   ld/ls — same postings docid-sorted (the NRA exact lookup)
        #   n    — units folded so far (folding follows the static
        #          desc-ub unit order, so n IS the resume pointer)
        #   floors — per-shard tail floor once its deepest chunk folds
        ist = st.setdefault("istream", {
            "d": np.empty(0, dtype=np.int64), "s": np.empty(0),
            "ld": np.empty(0, dtype=np.int64), "ls": np.empty(0),
            "n": 0, "floors": {}, "ld_np": 0})
        # refresh the exact-lookup with EVERYTHING decoded so far
        # (folded chunks + probe/sweep-decoded blocks): a warm repeat
        # then resolves every candidate from ld — zero random access.
        # Duplicate postings (a chunk's posting also in its covering
        # block) are harmless: identical (docid, score), and
        # searchsorted only needs one. Bound validity is unaffected —
        # more founds only replace a ≤-bound with the exact value.
        if ist["ld_np"] != st["np"] and (st["iseg"] or st["seg"]):
            parts = ([st["iseg"][c] for c in sorted(st["iseg"])]
                     + [st["seg"][o] for o in sorted(st["seg"])])
            ld = np.concatenate([p[0] for p in parts])
            ls = np.concatenate([p[1] for p in parts])
            dk = np.argsort(ld, kind="stable")
            ist["ld"], ist["ls"] = ld[dk], ls[dk]
            ist["ld_np"] = st["np"]
        # snapshot of regular blocks whose postings are ALL in ld (the
        # pre-call decode set): a candidate covered by such a block and
        # NOT found in ld is provably absent from this term — no probe.
        # Blocks decoded later in THIS call are deliberately excluded
        # (their postings enter ld only at the next call's resync).
        segmask = np.zeros(d["ub"].size, dtype=bool)
        if st["seg"]:
            segmask[np.fromiter(st["seg"].keys(), dtype=np.int64,
                                count=len(st["seg"]))] = True
        iub = d.get("iub")
        if iub is None:
            iub = np.empty(0)
        ish = d.get("ishard", np.empty(0, dtype=np.int64))
        ind = d.get("ind", np.empty(0, dtype=np.int64))
        ps = np.unique(ish)
        short_ords = np.flatnonzero(~np.isin(d["bshard"], ps))
        u_ub = np.concatenate([iub, d["ub"][short_ords]])
        u_pref = np.concatenate([np.ones(iub.size, dtype=bool),
                                 np.zeros(short_ords.size, dtype=bool)])
        u_ref = np.concatenate([np.arange(iub.size, dtype=np.int64),
                                short_ords.astype(np.int64)])
        order = np.argsort(-u_ub, kind="stable")
        # per prefix shard: deepest chunk + whether a tail exists
        # beyond the prefix (chunks are (shard, rank)-sorted, so the
        # last chunk index of a shard is its deepest)
        tails = {}
        for s in ps.tolist():
            sm = ish == s
            covered = int(ind[sm].sum())
            total_s = int(d["nd"][d["bshard"] == s].sum())
            deepest = int(np.flatnonzero(sm)[-1])
            open_ = covered < total_s
            ub0 = ist["floors"].get(int(s), float(iub[deepest])) if open_ \
                else 0.0
            tails[s] = {"deepest": deepest, "open": open_, "ub": ub0}
        # two-layer stream: "sd"/"ss" is the BASE (the memoized ist
        # arrays, sorted score desc / docid asc) consumed from "qb";
        # "d2"/"s2" is a small sorted DELTA holding postings folded
        # THIS call, consumed from "q2". Folds merge into the delta
        # only (one small lexsort); the delta compacts into the base
        # when it reaches a quarter of it, so the full-stream resort
        # the old per-flush merge paid on every round is amortized
        # geometric — O(n log n) total instead of O(rounds · n log n)
        # (the profiled quadratic-at-flush-granularity cost). The
        # docid-lookup arrays layer identically ("ld"+"ld2").
        units[t] = {"ub": u_ub, "pref": u_pref, "ref": u_ref,
                    "order": order, "p": int(ist["n"]), "tails": tails,
                    "ist": ist, "segmask": segmask,
                    "sd": ist["d"], "ss": ist["s"], "qb": 0,
                    "d2": np.empty(0, dtype=np.int64), "s2": np.empty(0),
                    "q2": 0,
                    "ld": ist["ld"], "ls": ist["ls"],
                    "ld2": np.empty(0, dtype=np.int64),
                    "ls2": np.empty(0),
                    "pending": [], "pend_np": 0, "pend_max": -np.inf}

    def _ta_probe(t, nf):
        """Exact contributions for the not-found-in-ld candidates of
        one term: candidates whose covering block was already decoded
        BEFORE this call are provably absent (ld is authoritative for
        the snapshot) — only the rest pay random access."""
        nonlocal n_reg
        d = tb[t]
        contrib = np.zeros(nf.size)
        hit = np.zeros(nf.size, dtype=bool)
        if not d["first"].size:
            return contrib, hit
        j = np.searchsorted(d["first"], nf, side="right") - 1
        jc = np.clip(j, 0, d["first"].size - 1)
        covered = (j >= 0) & (nf <= d["last"][jc])
        need = covered & ~units[t]["segmask"][jc]
        if need.any():
            st = store[t]
            n_reg += _ensure_blocks(d, st, jc[need], k1, b, avgdl)
            cd, cs = _seg_lookup(st, jc[need])
            pos = np.searchsorted(cd, nf[need])
            pos_c = np.minimum(pos, cd.size - 1)
            h = cd[pos_c] == nf[need]
            contrib[need] = np.where(h, cs[pos_c], 0.0)
            hit[need] = h
        return contrib, hit

    def _decode_unit(t: str, ui: int):
        """Fold unit ``ui`` of term t into the pending batch (merged
        into the delta layer at the round's flush). The delta pointer
        resets to 0 on merge: already-consumed docids regenerate as
        candidates and are dropped by ``scored`` dedup, and a stream
        head that points at a consumed posting only OVERestimates the
        unseen bound — conservative, never wrong."""
        nonlocal n_pref, n_reg
        u = units[t]
        d = tb[t]
        st = store[t]
        ist = u["ist"]
        if u["pref"][ui]:
            ci = int(u["ref"][ui])
            got = st["iseg"].get(ci)
            if got is None:
                dd, tf, dl = codec.decode_block(
                    d["ideltas"][ci], d["itfs"][ci], d["idls"][ci],
                    int(d["ind"][ci]))
                got = st["iseg"][ci] = (dd, _bm25_scores(d, tf, dl,
                                                         k1, b, avgdl))
                st["np"] += int(d["ind"][ci])
                n_pref += 1
            sh = int(d["ishard"][ci])
            tl = u["tails"].get(sh)
            if tl is not None and tl["deepest"] == ci and tl["open"]:
                # the P-th impact bounds everything beyond the prefix
                floor = float(got[1].min())
                tl["ub"] = min(tl["ub"], floor)
                ist["floors"][sh] = min(ist["floors"].get(sh, floor), floor)
        else:
            o = int(u["ref"][ui])
            n_reg += _ensure_blocks(d, st, np.asarray([o]), k1, b, avgdl)
            got = st["seg"][o]
        # defer the stream merge to _fold_flush: re-sorting the whole
        # accumulated stream per 128-posting chunk is quadratic over a
        # cold sweep; one resort per term per round is not
        u["pending"].append(got)
        u["pend_np"] += int(got[0].size)
        if got[1].size:
            u["pend_max"] = max(u["pend_max"], float(got[1].max()))
        ist["ld_np"] = -1   # probes may also have decoded: resync next call
        ist["n"] += 1

    def _fold_flush(t: str):
        """Merge every unit folded since the last flush into the
        DELTA layer (small lexsort + small docid resort), compacting
        delta into base geometrically. Consumed delta postings are
        kept and re-offered after a merge (q2 resets; ``scored``
        dedup drops them — the same semantics the old full-stream
        q=0 reset had), so the stream always contains every folded
        posting and the head bounds stay valid."""
        u = units[t]
        if not u["pending"]:
            return
        pd_ = np.concatenate([u["d2"]] + [g[0] for g in u["pending"]])
        ps_ = np.concatenate([u["s2"]] + [g[1] for g in u["pending"]])
        key = np.lexsort((pd_, -ps_))
        u["d2"], u["s2"], u["q2"] = pd_[key], ps_[key], 0
        ld = np.concatenate([u["ld2"]] + [g[0] for g in u["pending"]])
        ls = np.concatenate([u["ls2"]] + [g[1] for g in u["pending"]])
        dk = np.argsort(ld, kind="stable")
        u["ld2"], u["ls2"] = ld[dk], ls[dk]
        u["pending"], u["pend_np"], u["pend_max"] = [], 0, -np.inf
        if u["s2"].size > max(4096, u["ss"].size // 4):
            _compact(t)

    def _compact(t: str):
        """Fold the delta layers into the base (and into the memoized
        ist, which must hold ALL folded postings at call boundaries —
        the warm path re-consumes it with a fresh pointer)."""
        u = units[t]
        if not u["s2"].size:
            return
        ist = u["ist"]
        nd = np.concatenate([u["sd"], u["d2"]])
        ns = np.concatenate([u["ss"], u["s2"]])
        key = np.lexsort((nd, -ns))
        ist["d"], ist["s"] = nd[key], ns[key]
        u["sd"], u["ss"], u["qb"] = ist["d"], ist["s"], 0
        u["d2"], u["s2"], u["q2"] = np.empty(0, dtype=np.int64), \
            np.empty(0), 0
        ld = np.concatenate([u["ld"], u["ld2"]])
        ls = np.concatenate([u["ls"], u["ls2"]])
        dk = np.argsort(ld, kind="stable")
        # u-local only: ist["ld"] is rebuilt from the segment stores
        # at the next call's entry resync (ld_np bookkeeping)
        u["ld"], u["ls"] = ld[dk], ls[dk]
        u["ld2"], u["ls2"] = np.empty(0, dtype=np.int64), np.empty(0)

    def _finalize():
        """Call-exit invariant: ist holds every folded posting in one
        sorted run (ist["n"] is the fold resume pointer — a stream
        missing folded postings would underbound the term on the next
        call)."""
        for t in terms:
            u = units.get(t)
            if u is None:
                continue
            if u["pending"]:
                _fold_flush(t)
            _compact(t)

    def bound(t: str) -> float:
        u = units[t]
        head = float(u["ss"][u["qb"]]) if u["qb"] < u["ss"].size else 0.0
        if u["q2"] < u["s2"].size:
            head = max(head, float(u["s2"][u["q2"]]))
        if u["pending"]:    # postings folded but not yet flushed
            head = max(head, u["pend_max"])
        nxt = float(u["ub"][u["order"][u["p"]]]) if u["p"] < u["order"].size \
            else 0.0
        tail = max((x["ub"] for x in u["tails"].values()), default=0.0)
        return max(head, nxt, tail)

    got_d, got_s, got_m = [], [], []
    scored = np.empty(0, dtype=np.int64)
    n_ok, theta, batch = 0, -np.inf, 8
    fellback = False
    # θ = max over two RUNNING k-best pools of per-doc lower bounds:
    # exact totals of probed docs, and PARTIAL sums (found-term
    # contributions) of candidates — actual ≥ partial, each doc
    # appears at most once per pool (candidates enter the partial
    # pool once; probes enter the exact pool once), and the k-th best
    # of either pool alone is a valid bar, so their max is too. In
    # the saturated regime the true winners sit in BOTH terms'
    # prefixes, so their partials push θ to near-final BEFORE any
    # random access — this is what keeps the probe flood bounded.
    pool_ex = np.empty(0)
    pool_pt = np.empty(0)

    def _add_pool(pool, vals):
        nonlocal theta
        if vals.size:
            pool = np.concatenate([pool, vals])
            if pool.size > k:
                pool = np.partition(pool, -k)[-k:]
        if pool.size >= k:
            theta = max(theta, float(pool.min()))
        return pool
    def _dense_merge_finish():
        """Flip to the vectorized exhaustive merge: flush the memoized
        streams (call-exit invariant), bulk-decode everything (batched
        varint, memoized on tb as ``dense`` — the eviction accounting
        already charges it), and return the one-pass scatter-sum
        top-k. Rank-identical to continuing the sweep: the merge
        computes complete exact totals for every doc, superseding the
        partial got_* pools."""
        _finalize()
        dense = _dense_arrays_from_tb(tb, k1, b, avgdl)
        if stats is not None:
            stats["prefix_ta"] = True
            stats["prefix_chunks_decoded"] = n_pref
            stats["prefix_chunks_total"] = int(
                sum(tb[t]["iub"].size for t in terms
                    if tb[t].get("iub") is not None))
            stats["blocks_decoded"] = (blocks_total
                                       if blocks_total is not None
                                       else n_reg)
            if blocks_total is not None:
                stats["blocks_total"] = blocks_total
            stats["dense_bailout"] = True
            stats["dense_merge"] = True
            stats["cands_consumed"] = int(scored.size)
        return _topk_dense_merge(dense, k, msm_req, theta=theta)

    while True:
        T = float(np.sum([bound(t) for t in terms]))
        if n_ok >= k and theta - T > _TA_SLACK:
            break
        # all-dense regime detector (≥3 terms): the NRA bound is not
        # separating — an unseen doc holding every term stays possible
        # until the lists exhaust — when EITHER the candidate flood
        # outgrows the threshold, OR the probe phase has already been
        # forced to decode a material share of all blocks (the probe
        # flood IS decode-everything, paid one candidate batch at a
        # time with per-round overhead on top). Both measured one
        # one-sided way: terminating query shapes on the 6.63M-doc
        # smoke stay under 37k candidates / 12% probe-decoded blocks;
        # flood shapes blow through both. The exhaustive merge is then
        # strictly cheaper AND bounded: O(total postings), not
        # O(rounds · flood).
        if len(terms) >= 3 and (
                scored.size > _DENSE_MERGE_CANDS
                or (blocks_total is not None
                    and n_reg - n_base > max(_DENSE_MERGE_MIN_BLOCKS,
                                             int(blocks_total
                                                 * _DENSE_MERGE_BLOCK_FRAC)))):
            return _dense_merge_finish()
        cands = []
        progressed = False
        for t in terms:
            u = units[t]
            # keep the stream ahead of the unvisited units so
            # consumption approximates global impact order (the bound
            # stays valid either way; this only speeds convergence).
            # avail counts UNCONSUMED postings across base, delta and
            # pending; head is the max over the three layer heads.
            while u["p"] < u["order"].size:
                avail = (u["ss"].size - u["qb"]) \
                    + (u["s2"].size - u["q2"]) + u["pend_np"]
                head = -np.inf
                if u["qb"] < u["ss"].size:
                    head = float(u["ss"][u["qb"]])
                if u["q2"] < u["s2"].size:
                    head = max(head, float(u["s2"][u["q2"]]))
                if u["pending"]:
                    head = max(head, u["pend_max"])
                has_head = np.isfinite(head)
                if not (avail < batch
                        or (has_head
                            and u["ub"][u["order"][u["p"]]] >= head)):
                    break
                _decode_unit(t, int(u["order"][u["p"]]))
                u["p"] += 1
            _fold_flush(t)
            # take up to ``batch`` candidates from EACH layer head —
            # candidates are an unordered, scored-deduped set, so
            # over-offering across layers only speeds θ convergence;
            # the NRA prune drops the hopeless before any probe
            take = min(batch, u["ss"].size - u["qb"])
            if take > 0:
                cands.append(u["sd"][u["qb"]:u["qb"] + take])
                u["qb"] += take
                progressed = True
            t2 = min(batch, u["s2"].size - u["q2"])
            if t2 > 0:
                cands.append(u["d2"][u["q2"]:u["q2"] + t2])
                u["q2"] += t2
                progressed = True
        if not progressed:
            if T <= 0.0:
                break
            # prefixes exhausted without separation (degenerate
            # uniform corpus) — finish with the vectorized exhaustive
            # merge (decode-all is unavoidable here; the merge replaces
            # the old decode-then-re-probe loop)
            fellback = True
            return _dense_merge_finish()
        batch = min(batch * 2, 4096)
        if not cands:
            continue
        cand = _drop_scored(np.unique(np.concatenate(cands)), scored)
        if cand.size == 0:
            continue
        # NRA prune before any random access (Fagin's NRA upper
        # bounds): exact contributions are FREE for postings already
        # decoded (ld lookup); a term where the candidate was not
        # found can contribute at most max(next unvisited unit ub,
        # tail floor). Candidates whose optimistic total provably
        # cannot reach θ are dropped without touching the docid
        # blocks — in the tf-saturated regime (scores nearly flat)
        # this is almost every single-term candidate, which is what
        # keeps the probe cost O(contenders), not O(consumed).
        exact_c = {}
        found_c = {}
        opt = np.zeros(cand.size)
        partial = np.zeros(cand.size)
        matched_f = np.zeros(cand.size, dtype=np.int32)
        for t in terms:
            u = units[t]
            hit = np.zeros(cand.size, dtype=bool)
            ex = np.zeros(cand.size)
            for la, ls_ in ((u["ld"], u["ls"]), (u["ld2"], u["ls2"])):
                if not la.size:
                    continue
                pos = np.searchsorted(la, cand)
                pos_c = np.minimum(pos, la.size - 1)
                h = la[pos_c] == cand
                ex = np.where(h, ls_[pos_c], ex)
                hit |= h
            exact_c[t], found_c[t] = ex, hit
            partial += ex
            matched_f += hit.astype(np.int32)
            nxt = float(u["ub"][u["order"][u["p"]]]) \
                if u["p"] < u["order"].size else 0.0
            tail = max((x["ub"] for x in u["tails"].values()), default=0.0)
            bnf = max(nxt, tail)
            opt += np.where(hit, ex, bnf)
        scored = np.union1d(scored, cand)   # pruned stay pruned: θ only grows

        # partials of THIS round's candidates immediately tighten θ.
        # msm: a candidate's found-term count UNDERcounts its true
        # matches, so found-qualified ⇒ qualified (monotone).
        pool_pt = _add_pool(pool_pt, partial[matched_f >= msm_req]
                            if msm_req else partial)

        # probe contenders in DESCENDING optimistic-bound order, in
        # small chunks with θ refreshed between chunks: the strongest
        # contenders (co-occurring docs) establish θ after ~k probes,
        # after which one fully-pruned chunk ends the round — probe
        # cost tracks the number of true contenders, not consumption
        pos_order = np.lexsort((cand, -opt))
        chunkp = max(k, 16)
        i = 0
        while i < pos_order.size:
            idxs = pos_order[i:i + chunkp]
            i += chunkp
            chunkp = min(chunkp * 2, 2048)
            if np.isfinite(theta):
                live_i = idxs[theta - opt[idxs] <= _TA_SLACK]
                if live_i.size == 0:
                    break   # opt-desc order: everything after is pruned too
                idxs = live_i
            idxs = idxs[np.argsort(cand[idxs])]   # probe wants docid order
            keep = cand[idxs]
            total = np.zeros(keep.size)
            matched = np.zeros(keep.size, dtype=np.int32)
            for t in terms:   # sorted accumulation order — determinism rule
                f = found_c[t][idxs]
                contrib = np.where(f, exact_c[t][idxs], 0.0)
                hit = f.copy()
                nf = keep[~f]
                if nf.size:
                    # random access only for the not-found terms of
                    # surviving contenders — decode just the covering
                    # blocks; found terms already carry exact scores
                    c2, h2 = _ta_probe(t, nf)
                    contrib[~f] = c2
                    hit[~f] = h2
                total += contrib
                matched += hit.astype(np.int32)
            got_d.append(keep)
            got_s.append(total)
            got_m.append(matched)
            n_ok += int((matched >= msm_req).sum()) if msm_req else keep.size
            pool_ex = _add_pool(pool_ex, total[matched >= msm_req]
                                if msm_req else total)

    _finalize()
    if stats is not None:
        stats["cands_consumed"] = int(scored.size)
        stats["prefix_ta"] = True
        stats["prefix_chunks_decoded"] = n_pref
        stats["prefix_chunks_total"] = int(
            sum(tb[t]["iub"].size for t in terms
                if tb[t].get("iub") is not None))
        stats["blocks_decoded"] = n_reg
        if blocks_total is not None:
            stats["blocks_total"] = blocks_total
        stats["dense_bailout"] = fellback

    if not got_d:
        return zero
    cand = np.concatenate(got_d)
    total = np.concatenate(got_s)
    if msm_req:
        okm = np.concatenate(got_m) >= msm_req
        cand, total = cand[okm], total[okm]
    if cand.size == 0:
        return zero
    return _pinned_topk(cand, total, k)


def _exact_scores_over(sources: dict, names, cand: np.ndarray):
    """Σ per-list contributions + hit counts for sorted-unique ``cand``.

    THE exact-scoring probe every kernel path shares; ``names`` fixes
    the accumulation order (the determinism rule — float addition is
    not associative, and the pinned oracle sums in sorted-term order).
    """
    total = np.zeros(cand.size)
    matched = np.zeros(cand.size, dtype=np.int32)
    for t in names:
        td = sources[t]
        pos = np.searchsorted(td["docids"], cand)
        pos_c = np.minimum(pos, td["docids"].size - 1)
        hit = td["docids"][pos_c] == cand
        total += np.where(hit, td["scores"][pos_c], 0.0)
        matched += hit.astype(np.int32)
    return total, matched


def _drop_scored(cand: np.ndarray, scored: np.ndarray) -> np.ndarray:
    """Remove already-scored docids (both arrays sorted unique)."""
    if not scored.size or not cand.size:
        return cand
    p = np.searchsorted(scored, cand)
    pc = np.minimum(p, scored.size - 1)
    return cand[scored[pc] != cand]


def _topk_from_terms(terms: dict, k: int, msm_req: int, use_wand: bool):
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0)

    names = sorted(terms, key=lambda t: -terms[t]["max_ub"])

    def exact_scores(cand: np.ndarray):
        return _exact_scores_over(terms, sorted(terms), cand)

    if not use_wand or len(names) <= 1:
        cand = np.unique(np.concatenate([terms[t]["docids"] for t in names]))
        total, matched = exact_scores(cand)
    else:
        # ---- block-max two-phase pruning (score-neutral) ----
        # phase 1: exact over the strongest 2 terms' candidates → θ
        seed_terms = names[:2]
        cand1 = np.unique(np.concatenate([terms[t]["docids"] for t in seed_terms]))
        tot1, mat1 = exact_scores(cand1)
        if msm_req:
            ok = mat1 >= msm_req
            sc_for_theta = tot1[ok]
        else:
            sc_for_theta = tot1
        if sc_for_theta.size >= k:
            theta = np.partition(sc_for_theta, -k)[-k]
        else:
            theta = -np.inf
        # phase 2: docs only in the remaining terms; UB via block-max
        rest = names[2:]
        if rest:
            cand2 = np.unique(np.concatenate([terms[t]["docids"] for t in rest]))
            cand2 = _drop_scored(cand2, cand1)
            if cand2.size:
                ub = np.zeros(cand2.size)
                for t in names:
                    td = terms[t]
                    # block containing/preceding each candidate
                    bi = np.searchsorted(td["block_first"], cand2, side="right") - 1
                    bi = np.clip(bi, 0, len(td["block_ub"]) - 1)
                    # candidate may fall between blocks; UB of the located
                    # block is a valid bound when the doc is in the list,
                    # and irrelevant when absent — include membership test
                    pos = np.searchsorted(td["docids"], cand2)
                    pos_c = np.minimum(pos, td["docids"].size - 1)
                    present = td["docids"][pos_c] == cand2
                    ub += np.where(present, td["block_ub"][bi], 0.0)
                keep = ub >= theta if np.isfinite(theta) else np.ones(cand2.size, bool)
                cand2 = cand2[keep]
            if cand2.size:
                tot2, mat2 = exact_scores(cand2)
                cand = np.concatenate([cand1, cand2])
                total = np.concatenate([tot1, tot2])
                matched = np.concatenate([mat1, mat2])
            else:
                cand, total, matched = cand1, tot1, mat1
        else:
            cand, total, matched = cand1, tot1, mat1

    if msm_req:
        ok = matched >= msm_req
        cand, total = cand[ok], total[ok]
    if cand.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)

    # top-k by (-round(score,9), docid) — the pinned tie-break
    return _pinned_topk(cand, total, k)


def bm25_topk_batch(reader: IndexReader, queries: list[tuple[str, str]],
                    k: int = 10, use_wand: bool = True,
                    min_should_match: bool = False,
                    offset: int = 0) -> DataFrame:
    """Answer MANY queries in ONE Spark job → (qid, docid, score).

    The analytics flavor of the query engine (replay a whole query log
    against a snapshot): one pruned postings scan for the UNION of all
    query terms, each shard's blocks decoded ONCE, every query scored
    against the shared decoded arrays, then a per-qid window rank for
    the global top-k. At 10^12-doc scale this is the right shape —
    per-query jobs would re-pay scan+schedule costs N times.
    """
    spark = reader.spark
    out_schema = "qid string, docid long, score double"
    if len({qid for qid, _ in queries}) != len(queries):
        raise ValueError("duplicate qids in batch")
    analyzed = {qid: sorted(set(analyze_query(reader.man, q)))
                for qid, q in queries}
    all_terms = sorted({t for ts in analyzed.values() for t in ts})
    empty = spark.createDataFrame([], out_schema)
    if not all_terms:
        return empty
    dfs = reader.stats_for(all_terms)
    live = sorted(t for t in all_terms if t in dfs)
    if not live:
        return empty
    n_docs, avgdl = reader.man.n_docs, reader.man.avgdl
    k1, b = reader.man.params["k1"], reader.man.params["b"]
    idf = {t: bm25.idf(n_docs, dfs[t]) for t in live}
    reqs = {qid: (bm25.msm_required(len(ts)) if min_should_match else 0)
            for qid, ts in analyzed.items()}

    bks = reader.buckets_of(live)
    blocks = (reader.postings
              .where(F.col("bucket").isin(bks) & F.col("term").isin(live))
              .select("term", "shard", "block_id", "first_docid", "last_docid",
                      "n_docs", "max_score_ub", "deltas", "tfs", "dls"))

    qterms_b = analyzed  # closures (broadcast by task serialization)
    reqs_b = reqs
    wand, kk = use_wand, k + max(0, offset)

    def _score_shard_batch(pdf):
        import pandas as pd
        arrays = _decode_term_arrays(pdf, idf, k1, b, avgdl)
        qids, docs_out, scores_out = [], [], []
        for qid, ts in qterms_b.items():
            sub = {t: arrays[t] for t in ts if t in arrays}
            if not sub:
                continue
            d, s = _topk_from_terms(sub, kk, reqs_b[qid], wand)
            qids.extend([qid] * d.size)
            docs_out.append(d)
            scores_out.append(s)
        if not qids:
            return pd.DataFrame({"qid": [], "docid": [], "score": []})
        return pd.DataFrame({
            "qid": qids,
            "docid": np.concatenate(docs_out),
            "score": np.concatenate(scores_out),
        })

    per_shard = blocks.groupBy("shard").applyInPandas(
        _score_shard_batch, schema=out_schema)

    w = Window.partitionBy("qid").orderBy(
        F.round(F.col("score"), 9).desc(), F.asc("docid"))
    return (per_shard.withColumn("__rn", F.row_number().over(w))
            .where((F.col("__rn") > offset) & (F.col("__rn") <= offset + k))
            .drop("__rn"))
