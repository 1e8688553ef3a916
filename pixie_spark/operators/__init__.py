"""Operators beyond stock Spark: deduplication, similarity search, text
analysis, multimodal plumbing — the training-data-pipeline extensions
that make this engine useful at 100 TB (BASELINE.json north star)."""

from pixie_spark.operators import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
