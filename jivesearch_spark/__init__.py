"""jivesearch_spark — PySpark-native crawl-to-index + BM25 query engine.

A brand-new engine with the query/data-processing capabilities of the
reference (`/root/reference`, squareinc/jivesearch, a Go search engine
backed by Elasticsearch 6.2.4): HTML text extraction byte-identical to
the reference extractor (search/document/document.go), a pinned
tokenizer/analyzer, a term-partitioned compressed inverted index built
entirely with DataFrame ops + Arrow pandas UDFs, and a top-k BM25 query
path with block-max WAND pruning — designed for 10^12-doc scale
(salting for head-term skew, resumable partition-manifest builds,
deterministic segment merge).
"""

__version__ = "0.1.0"
