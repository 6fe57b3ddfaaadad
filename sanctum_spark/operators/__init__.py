"""Reusable Spark-first operators beyond the built-in DataFrame surface:

- ``joins``      — as-of and range join helpers
- ``topk``       — global and per-group top-k
- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram Jaccard near-dup
- ``similarity`` — cosine top-k (brute force) and LSH-bucketed ANN
- ``text``       — tokenize, language-ID, quality scoring, fingerprints
- ``multimodal`` — binary-column conventions + decode/resize plumbing
"""
