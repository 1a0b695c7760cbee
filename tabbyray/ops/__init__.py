"""Web-scale training-data operators built on ray.data primitives.

These are first-class components of the engine alongside the STI
pipeline (SURVEY.md §2): deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding cosine), similarity search (brute-force and
LSH-bucketed ANN), text analysis (language-ID, quality scoring, token
counting, fingerprinting) and relational helpers (grouped argmax,
partial-aggregate groupby).
"""
