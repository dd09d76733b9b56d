from titan_spark.compute.pregel import aggregate_messages, pregel
from titan_spark.compute.algorithms import (
    clustering_coefficient,
    connected_components,
    k_core,
    k_truss,
    label_propagation,
    peer_pressure,
    closeness_centrality,
    harmonic_centrality,
    degree_count,
    pagerank,
    personalized_pagerank,
    shortest_distance,
    triangle_count,
)

__all__ = [
    "aggregate_messages",
    "pregel",
    "pagerank",
    "personalized_pagerank",
    "shortest_distance",
    "degree_count",
    "connected_components",
    "label_propagation",
    "peer_pressure",
    "closeness_centrality",
    "harmonic_centrality",
    "triangle_count",
    "k_core",
    "k_truss",
    "clustering_coefficient",
]
