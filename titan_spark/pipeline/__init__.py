"""Large-scale training-data pipeline operators over the engine's tables:
deduplication, similarity search, text analysis, multimodal plumbing."""

from titan_spark.pipeline.dedup import exact_dedup_stats, exact_duplicate_groups
from titan_spark.pipeline.similarity import cosine_topk
from titan_spark.pipeline.text_quality import doc_quality, token_stats

__all__ = [
    "exact_dedup_stats",
    "exact_duplicate_groups",
    "cosine_topk",
    "token_stats",
    "doc_quality",
]
