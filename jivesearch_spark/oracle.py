"""Pure-Python brute-force BM25 oracle (the pinned scorer spec).

Golden outputs for the reference query set are produced by this module
(FIXTURES.md §3): same pinned analyzer, Lucene-7 BM25 with k1=1.2 and
b=0.75, exact field lengths, float64 accumulation in sorted-term order,
ties broken by doc id ascending. The Spark brute-force path, the
compressed-index path, and WAND-on/off must all match it rank-
identically with scores to 1e-6.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from . import analyze, bm25


def _idf(n: int, df: int) -> float:
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


class SingleFieldIndex:
    """Brute-force in-memory index over (doc_id → text)."""

    def __init__(self, docs: dict):
        self.tf: dict[str, dict] = defaultdict(dict)   # term -> {doc: tf}
        self.dl: dict = {}
        ids = sorted(docs)
        for d in ids:
            toks = analyze.py_tokens(docs[d])
            self.dl[d] = len(toks)
            for t, c in Counter(toks).items():
                self.tf[t][d] = c
        self.n = len(ids)
        self.avgdl = (sum(self.dl.values()) / self.n) if self.n else 0.0

    def topk(self, query: str, k: int = 10, min_should_match: bool = False):
        q_terms = sorted(set(analyze.py_tokens(query)))
        scores: dict = defaultdict(float)
        matched: dict = defaultdict(int)
        for t in q_terms:  # sorted-term accumulation order (determinism)
            postings = self.tf.get(t)
            if not postings:
                continue
            w = _idf(self.n, len(postings))
            for d, tf in postings.items():
                scores[d] += w * bm25.tf_norm(tf, self.dl[d], self.avgdl)
                matched[d] += 1
        if min_should_match:
            req = bm25.msm_required(len(q_terms))
            scores = {d: s for d, s in scores.items() if matched[d] >= req}
        return sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:k]


class FieldedIndex:
    """Brute-force fielded index matching bm25.bm25_fielded_topk.

    ``docs``: {doc_id: {"title":…, "description":…, "domain":…,
    "path_parts":…, "tld":…, "index":bool, "lang":…}}
    """

    def __init__(self, docs: dict, lang: str | None = None):
        self.docs = {
            d: v for d, v in docs.items()
            if v.get("index", True) and (lang is None or v.get("lang") == lang)
        }
        self.n = len(self.docs)
        self.fields: dict[str, dict] = {}
        for fname, _b in bm25.SCORING_FIELDS:
            self.fields[fname] = self._build(fname, shingle=False)
        for fname, _b in bm25.SHINGLE_FIELDS:
            self.fields[fname + ".shingles"] = self._build(fname, shingle=True)
        self.tld_df = Counter(v.get("tld", "") for v in self.docs.values())

    def _build(self, fname: str, shingle: bool):
        tf = defaultdict(dict)
        dl = {}
        for d in sorted(self.docs):
            toks = analyze.py_tokens(self.docs[d].get(fname, "") or "")
            if shingle:
                toks = analyze.py_bigrams(toks)
            dl[d] = len(toks)
            for t, c in Counter(toks).items():
                tf[t][d] = c
        avgdl = (sum(dl.values()) / self.n) if self.n else 0.0
        return {"tf": tf, "dl": dl, "avgdl": avgdl}

    def topk(self, query: str, k: int = 10, shingles: bool = True,
             tld_boost: str | None = None, min_should_match: bool = True):
        q_tokens = analyze.py_tokens(query)
        q_terms = sorted(set(q_tokens))
        q_bi = sorted(set(analyze.py_bigrams(q_tokens)))
        if not q_terms or not self.n:
            return []

        scores: dict = defaultdict(float)
        matched: dict = defaultdict(set)

        specs = [(f, b, q_terms, False) for f, b in bm25.SCORING_FIELDS]
        if shingles and q_bi:
            specs += [(f + ".shingles", b, q_bi, True) for f, b in bm25.SHINGLE_FIELDS]

        for fname, boost, terms, is_shingle in specs:
            fld = self.fields[fname]
            for t in terms:
                postings = fld["tf"].get(t)
                if not postings:
                    continue
                w = _idf(self.n, len(postings))
                for d, tf in postings.items():
                    scores[d] += boost * w * bm25.tf_norm(tf, fld["dl"][d], fld["avgdl"])
                    if not is_shingle:
                        matched[d].add(t)

        if min_should_match:
            req = bm25.msm_required(len(q_terms))
            scores = {d: s for d, s in scores.items() if len(matched[d]) >= req}

        if tld_boost and tld_boost not in ("us", "tv", "me", "co", "io"):
            df = self.tld_df.get(tld_boost, 0)
            if df:
                w = _idf(self.n, df)  # tf_norm(1,1,1) == 1
                for d in list(scores):
                    if self.docs[d].get("tld") == tld_boost:
                        scores[d] += w

        return sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:k]
