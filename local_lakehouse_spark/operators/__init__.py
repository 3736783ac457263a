"""Large-scale training-data-pipeline operators (beyond-reference).

The reference (VillePuuska/Local-Lakehouse) has no analytics operators
of its own; these are the BASELINE.json north-star extensions: dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + LSH ANN), text analysis (language ID,
quality scoring, token counting, fingerprinting), as-of joins, and
multimodal column plumbing — all expressed as composable DataFrame
transforms designed for 100 TB semantics (no driver-side loops, no
collect, explicit broadcast/blocking strategies).
"""
