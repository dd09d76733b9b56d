from titan_spark.sources.tpch import load_tables, load_tpch_graph
from titan_spark.sources.gods import graph_of_the_gods
from titan_spark.sources.graphson import read_graphson, write_graphson
from titan_spark.sources.graphml import read_graphml
from titan_spark.sources.gryo import read_gryo

__all__ = [
    "load_tables",
    "load_tpch_graph",
    "graph_of_the_gods",
    "read_graphson",
    "write_graphson",
    "read_graphml",
    "read_gryo",
]
