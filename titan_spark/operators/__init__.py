from titan_spark.operators.traversal import GraphTraversal
from titan_spark.operators.topk import top_k_per_group
from titan_spark.operators.vertexquery import vertex_query
from titan_spark.operators.rawquery import raw_index_query

__all__ = ["GraphTraversal", "top_k_per_group", "vertex_query", "raw_index_query"]
