from titan_spark.sources.tpch import load_tables, load_tpch_graph
from titan_spark.sources.gods import graph_of_the_gods

__all__ = ["load_tables", "load_tpch_graph", "graph_of_the_gods"]
