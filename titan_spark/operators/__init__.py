from titan_spark.operators.traversal import GraphTraversal
from titan_spark.operators.topk import top_k_per_group

__all__ = ["GraphTraversal", "top_k_per_group"]
