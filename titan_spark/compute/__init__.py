from titan_spark.compute.pregel import aggregate_messages, pregel
from titan_spark.compute.algorithms import pagerank, shortest_distance, degree_count

__all__ = ["aggregate_messages", "pregel", "pagerank", "shortest_distance", "degree_count"]
