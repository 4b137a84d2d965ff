"""Layer B — the inverted index the reference outsources to Elasticsearch.

Build (build.py) → compressed posting blocks (codec.py) → persisted tables
(store.py) → query paths (query.py: DataFrame reference scorer + block-max
WAND fast path).
"""
