"""Training-data pipeline operators over document/embedding tables.

Beyond the reference's own operator set (SURVEY.md §2), these are the
operations a large-scale training-data pipeline needs at 100 TB:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language ID, quality scoring, token counting,
fingerprinting), and multimodal binary-column plumbing.
"""
