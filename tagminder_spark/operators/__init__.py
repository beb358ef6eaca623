"""Operator library: reusable DataFrame→DataFrame transforms.

- ``diff_audit``  the reference's cross-cutting change-capture protocol.
- ``dedupe``      exact / n-gram-jaccard / MinHash-LSH / SimHash /
                  embedding near-duplicate detection.
- ``similarity``  brute-force + IVF-bucketed vector top-k search.
- ``text``        language-ID, quality scoring, token counting,
                  fingerprinting for document pipelines.
"""
