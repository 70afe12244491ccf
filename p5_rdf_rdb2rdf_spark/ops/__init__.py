"""Large-scale training-data pipeline operations over document/embedding/
event tables: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine, cluster canonicalization), similarity search (brute-force
+ LSH/IVF-bucketed ANN + int8 scalar-quantized coarse scoring with exact
re-rank), text analysis (language-ID, quality, tokens, real vocab-driven
BPE tokenization,
fingerprints, vocabulary, decontamination, token-window chunking, sequence
packing), deterministic sampling/splits (modulo/hashed/stratified), event
sessionization, graph analytics (degrees, triangles, PageRank), and
multimodal column plumbing (real header/pixel decode, histograms, resize).
All hot paths are JVM Column expressions or Arrow-batched pandas UDFs —
never per-row Python.
"""
