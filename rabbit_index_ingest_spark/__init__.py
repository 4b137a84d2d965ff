"""rabbit_index_ingest_spark — a brand-new PySpark-native full-text indexing engine.

Re-expresses the capabilities of cedadev/rabbit-index-ingest (a RabbitMQ →
Elasticsearch ingest pipeline; see /root/reference) as a from-scratch Spark
engine:

* **Layer A** (pipeline semantics the reference implements itself —
  message decode, routing, prefix filters, broadcast dimension joins,
  content-derived doc IDs, idempotent upserts): `operators/`.
* **Layer B** (index/query semantics the reference delegates to
  Elasticsearch 7.9.1 / Lucene 8.6 — tokenization, inverted-index build,
  posting compression, BM25 scoring, block-max top-k): `index/` +
  `analysis.py`.

Everything is DataFrame-first: built-in `pyspark.sql.functions` in the hot
path, Arrow-vectorized pandas UDFs (`mapInPandas` / `applyInPandas`) only
where Spark lacks the operator (posting-block packing, block-max WAND).
"""

__version__ = "0.1.0"
