"""Deduplication operators for LLM-data pipelines (BASELINE.json scope):
exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine. All DataFrame-native — the LSH paths are shuffle-on-bucket joins
that scale to 100 TB; nothing does all-pairs comparison globally."""
