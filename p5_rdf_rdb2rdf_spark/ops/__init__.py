"""Large-scale training-data pipeline operations over document/embedding
tables: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality, tokens, fingerprints), and multimodal
column plumbing. All hot paths are JVM Column expressions or Arrow-batched
pandas UDFs — never per-row Python.
"""
