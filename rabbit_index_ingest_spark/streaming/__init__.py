"""Structured-Streaming ingest — the reference's consume loop, Spark-native."""
