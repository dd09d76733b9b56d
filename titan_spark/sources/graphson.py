"""GraphSON v1-style IO (Titan's bulk graph import/export, SURVEY §2.1 S9).

Reference: GraphSON & Gryo registered via
``graphdb/tinkerpop/TitanIoRegistry.java:14``; test fixture
``titan-test/data/v10k.graphml.gz``. GraphSON (JSON-lines of vertices
with inlined adjacency) is the primary interchange format; the Gryo
binary twin lives in ``sources/gryo.py``.

Format handled here: one JSON object per line,
``{"id": .., "label": .., "properties": {k: v | [v, ...]}, "outE":
[{"id": .., "label": .., "inV": .., "properties": {...}}, ...]}``.
Reading is schema-driven ``spark.read.json`` (distributed, no driver
parsing); writing re-nests with ``collect_list``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from titan_spark.graph import PropertyGraph


def read_graphson(
    spark: SparkSession,
    path: str,
    vertex_props: dict[str, str] | None = None,
    edge_props: dict[str, str] | None = None,
) -> PropertyGraph:
    """Load a GraphSON-lines file into a PropertyGraph.

    ``vertex_props`` / ``edge_props`` map property name → Spark type
    (e.g. {"name": "string", "age": "int"}); unlisted properties are
    dropped. Runs as two passes over one cached json scan.
    """
    vertex_props = vertex_props or {}
    edge_props = edge_props or {}
    vschema = ", ".join(f"`{k}` {t}" for k, t in vertex_props.items())
    eschema = ", ".join(f"`{k}` {t}" for k, t in edge_props.items())
    schema = (
        "id long, label string"
        + (f", properties struct<{vschema}>" if vertex_props else "")
        + ", outE array<struct<id: long, label: string, inV: long"
        + (f", properties: struct<{eschema}>" if edge_props else "")
        + ">>"
    )
    raw = spark.read.schema(schema).json(path).cache()

    vcols = [F.col("id"), F.col("label")]
    vcols += [F.col(f"properties.{k}").alias(k) for k in vertex_props]
    vertices = raw.select(*vcols)

    e = raw.select(F.col("id").alias("src"), F.explode_outer("outE").alias("e")).filter(
        F.col("e").isNotNull()
    )
    ecols = [
        F.col("e.id").alias("edge_id"),
        F.col("src"),
        F.col("e.inV").alias("dst"),
        F.col("e.label").alias("label"),
    ]
    ecols += [F.col(f"e.properties.{k}").alias(k) for k in edge_props]
    edges = e.select(*ecols)
    return PropertyGraph(vertices, edges)


def write_graphson(graph: PropertyGraph, path: str, mode: str = "overwrite") -> None:
    """Export as GraphSON-lines (adjacency re-nested per vertex)."""
    vprops = [c for c in graph.vertices.columns if c not in ("id", "label")]
    eprops = [c for c in graph.edges.columns if c not in ("edge_id", "src", "dst", "label")]
    out_edges = graph.edges.groupBy("src").agg(
        F.collect_list(
            F.struct(
                F.col("edge_id").alias("id"),
                F.col("label"),
                F.col("dst").alias("inV"),
                F.struct(*[F.col(c) for c in eprops]).alias("properties"),
            )
        ).alias("outE")
    )
    doc = (
        graph.vertices.join(out_edges, graph.vertices["id"] == out_edges["src"], "left")
        .drop("src")
        .select(
            "id",
            "label",
            F.struct(*[F.col(c) for c in vprops]).alias("properties"),
            "outE",
        )
    )
    doc.write.mode(mode).json(path)
