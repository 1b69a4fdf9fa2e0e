"""Low-latency BM25 serving over the compressed index — no Spark job.

The reference serves queries from Elasticsearch at millisecond latency
(`/root/reference/search/elasticsearch.go:21-67`); the 3 s handler /
5 s server budgets (`frontend/frontend.go:92`,
`frontend/cmd/frontend.go:81-84`) assume index *lookup*, not cluster
scheduling. Spark builds the index; serving a top-k query is a pruned
read of a few posting lists. This module is that read path:

1. ``term_stats`` lookup via a pyarrow dataset filter
   (``bucket IN buckets(Q) AND term IN Q``): hive partition pruning
   on ``bucket`` + parquet row-group min/max pruning on ``term`` —
   IO per query is O(|Q| posting lists) regardless of corpus size.
2. same pruned read over ``postings``; decode + score with the SAME
   numpy kernels the Spark path uses (`query._decode_term_arrays` +
   `query._topk_from_terms`, called once over the whole index instead
   of per doc-shard — shard ranges partition the docid space, so the
   concatenated arrays stay globally docid-sorted) — one code path ⇒
   rank identity between serve and cluster modes is structural, and
   the pinned tie-break (round(score,9) desc, docid asc) is
   replicated exactly. Decoded per-term arrays are kept in a bounded
   LRU so hot terms skip read+decode.

At 10^12 docs this is how a serving tier in front of the index works:
each frontend holds the manifest + term→df cache; every query reads
only its own terms' blocks (bucket directory + row-group pruning means
the files behave like a sharded KV store keyed by term). The Spark
path (`query.bm25_topk_indexed`) remains the batch/analytics flavor.
"""

from __future__ import annotations

from . import bm25
from .hashing import term_bucket
from .index import Manifest
from .query import _decode_term_arrays, _topk_from_terms, analyze_query

_POSTING_COLS = ["term", "shard", "block_id", "first_docid", "last_docid",
                 "n_docs", "max_score_ub", "deltas", "tfs", "dls"]


class LocalIndex:
    """Driver/serving-process handle on an on-disk index."""

    def __init__(self, root: str):
        import pyarrow.dataset as ds
        self.root = root
        self.man = Manifest.load(root)
        if self.man is None or not self.man.done:
            raise ValueError(f"no complete index at {root}")
        self.n_buckets = self.man.params["n_buckets"]
        self.k1 = self.man.params["k1"]
        self.b = self.man.params["b"]
        part = ds.partitioning(flavor="hive")
        self._postings = ds.dataset(f"{root}/postings", partitioning=part)
        self._stats = ds.dataset(f"{root}/term_stats", partitioning=part)
        self._df_cache: dict[str, int] = {}
        # decoded posting-list LRU (the serving analog of the
        # reference's result cache, frontend/search.go:439-453 — ours
        # caches the expensive artifact, decoded term arrays, which is
        # score-exact rather than TTL-stale). Bounded by total cached
        # postings; head terms dominate query logs, so hot queries skip
        # read+decode entirely.
        from collections import OrderedDict
        self._term_cache: OrderedDict[str, dict] = OrderedDict()
        self._cached_postings = 0
        self.term_cache_max_postings = 16_000_000

    # -- lookups ----------------------------------------------------------
    def buckets_of(self, terms: list[str]) -> list[int]:
        return sorted({term_bucket(t, self.n_buckets) for t in terms})

    def stats_for(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            import pyarrow.dataset as ds
            flt = (ds.field("bucket").isin(self.buckets_of(missing))
                   & ds.field("term").isin(missing))
            tbl = self._stats.to_table(filter=flt, columns=["term", "df"])
            found = dict(zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()))
            for t in missing:
                self._df_cache[t] = int(found.get(t, 0))
        return {t: self._df_cache[t] for t in terms if self._df_cache[t] > 0}

    def _blocks_for(self, terms: list[str]):
        import pyarrow.dataset as ds
        flt = (ds.field("bucket").isin(self.buckets_of(terms))
               & ds.field("term").isin(terms))
        return self._postings.to_table(
            filter=flt, columns=_POSTING_COLS).to_pandas()

    # -- query ------------------------------------------------------------
    def topk(self, query: str, k: int = 10, use_wand: bool = True,
             min_should_match: bool = False,
             offset: int = 0) -> list[tuple[int, float]]:
        """Top-k (docid, score); rank-identical to the Spark path.
        ``offset`` skips the first ranks (Fetch(number, offset) —
        search/elasticsearch.go:29,66)."""
        return self.topk_batch([query], k, use_wand, min_should_match,
                               offset)[query]

    def topk_batch(self, queries: list[str], k: int = 10,
                   use_wand: bool = True,
                   min_should_match: bool = False,
                   offset: int = 0):
        """Serve many queries with ONE pruned postings read (shared
        scan for the union of terms), then per-query kernels — the
        shape of a batched serving tier."""
        analyzed = {q: sorted(set(analyze_query(self.man, q)))
                    for q in queries}
        all_terms = sorted({t for ts in analyzed.values() for t in ts})
        if not all_terms:
            return {q: [] for q in queries}
        dfs = self.stats_for(all_terms)
        live = [t for t in all_terms if t in dfs]
        n_docs, avgdl = self.man.n_docs, self.man.avgdl

        # decode each term ONCE for the whole batch and the whole index
        # (shard ranges partition the docid space, so the concatenated
        # per-term arrays are globally docid-sorted) — no per-shard or
        # per-query re-decode; the kernel then computes the GLOBAL
        # top-k directly, which also gives WAND a global θ (strictly
        # more pruning than the per-shard θ, still score-neutral).
        # Cache hits skip the pruned read + decode altogether.
        missing = [t for t in live if t not in self._term_cache]
        if missing:
            pdf = self._blocks_for(missing)
            if len(pdf):
                idf_m = {t: bm25.idf(n_docs, dfs[t]) for t in missing}
                for t, a in _decode_term_arrays(
                        pdf, idf_m, self.k1, self.b, avgdl).items():
                    self._term_cache[t] = a
                    self._cached_postings += int(a["docids"].size)
        arrays = {}
        for t in live:
            a = self._term_cache.get(t)
            if a is not None:
                self._term_cache.move_to_end(t)
                arrays[t] = a
        while (self._cached_postings > self.term_cache_max_postings
               and len(self._term_cache) > len(arrays)):
            _, old = self._term_cache.popitem(last=False)
            self._cached_postings -= int(old["docids"].size)
        if not arrays:
            return {q: [] for q in queries}

        out = {}
        for q in queries:
            q_terms = analyzed[q]
            present = [t for t in q_terms if t in dfs and t in arrays]
            if not present:
                out[q] = []
                continue
            req = bm25.msm_required(len(q_terms)) if min_should_match else 0
            d, s = _topk_from_terms({t: arrays[t] for t in present},
                                    k + max(0, offset), req, use_wand)
            out[q] = [(int(di), float(si))
                      for di, si in zip(d[offset:], s[offset:])]
        return out
