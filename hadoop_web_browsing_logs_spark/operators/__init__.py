"""Composable DataFrame operators, grouped by domain.

- ``relational``  — scans, projections/filters, joins, aggregations, windows,
                    sorts/limits, set ops, scalar function surface (SURVEY B2-B8)
- ``text``        — tokenize/clean/stem, inverted index, tf-idf, text analysis
                    (reference parity A1-A10 + SURVEY B9)
- ``vectors``     — vector math, nearest-center assignment, k-means
                    (A11-A20, B12)
- ``similarity``  — cosine top-k / ANN over embeddings (B11)
- ``dedup``       — exact + near-duplicate detection (B10)
- ``multimodal``  — opaque binary columns with typed metadata + UDF plumbing
"""
