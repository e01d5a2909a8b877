"""Large-scale training-data corpus operations.

Beyond the reference's operator surface: the operations a 100 TB
training-data pipeline needs over document/embedding tables —
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine), approximate similarity search, text analysis
(language-ID, quality scoring, token counting, fingerprinting) and
multimodal column plumbing.
"""
