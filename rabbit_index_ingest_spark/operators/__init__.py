"""Layer A — the pipeline operators the reference implements directly
(SURVEY.md §2.1): message decode, routing, prefix filters, dimension
build/join, path-metadata projections, content-derived doc IDs — plus the
training-data-pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) a 100 TB corpus engine needs.
"""
