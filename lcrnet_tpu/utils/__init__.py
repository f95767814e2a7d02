"""Cross-cutting utilities: metrics, retrieval database, numpy helpers."""
