"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched mapInPandas (BASELINE.json scope).
Decoders are stubbed (no codec libs in this container) — the Spark-side
plumbing (schema, partitioning, UDF signature, batch shape) is real."""
