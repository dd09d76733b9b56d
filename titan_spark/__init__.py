"""titan_spark — a PySpark-native property-graph analytics engine.

Re-expresses the query and data-processing capabilities of the Titan
graph database (thinkaurelius/titan, reference at /root/reference) as
idiomatic Spark DataFrame plans: graphs are ``vertices`` / ``edges`` /
``vertex_properties`` DataFrames, traversals compile to joins, OLAP
vertex-programs run as a DataFrame Pregel loop, and all physical
optimization (pushdown, pruning, join strategy) is delegated to
Catalyst.

See SURVEY.md for the structural analysis of the reference that this
package implements.
"""

from titan_spark.graph import PropertyGraph
from titan_spark.operators.motif import find_motif
from titan_spark.operators.rawquery import raw_index_query
from titan_spark.operators.traversal import GraphTraversal, P
from titan_spark.operators.vertexquery import vertex_query
from titan_spark.schema import (
    Cardinality,
    GraphSchema,
    IndexStatus,
    Multiplicity,
    SchemaAction,
)
from titan_spark.session import get_spark

__all__ = [
    "PropertyGraph",
    "GraphTraversal",
    "P",
    "GraphSchema",
    "IndexStatus",
    "SchemaAction",
    "Cardinality",
    "Multiplicity",
    "get_spark",
    "find_motif",
    "raw_index_query",
    "vertex_query",
]

__version__ = "0.1.0"
