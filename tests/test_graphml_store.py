"""GraphML parsing and the parquet graph store (write/read roundtrip
with sorted adjacency + pushdown)."""

import gzip

from titan_spark.sources.graphml import read_graphml
from titan_spark.sources.gods import graph_of_the_gods

GRAPHML = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <key id="labelV" for="node" attr.name="labelV" attr.type="string"/>
  <key id="labelE" for="edge" attr.name="labelE" attr.type="string"/>
  <key id="name" for="node" attr.name="name" attr.type="string"/>
  <key id="age" for="node" attr.name="age" attr.type="int"/>
  <key id="weight" for="edge" attr.name="weight" attr.type="double"/>
  <graph id="G" edgedefault="directed">
    <node id="n0"><data key="labelV">person</data><data key="name">ana</data><data key="age">30</data></node>
    <node id="n1"><data key="labelV">person</data><data key="name">bo</data><data key="age">41</data></node>
    <node id="n2"><data key="labelV">city</data><data key="name">rome</data></node>
    <edge id="e0" source="n0" target="n1"><data key="labelE">knows</data><data key="weight">0.5</data></edge>
    <edge id="e1" source="n0" target="n2"><data key="labelE">lives</data></edge>
  </graph>
</graphml>
"""


def test_read_graphml(spark, tmp_path):
    p = tmp_path / "g.graphml"
    p.write_text(GRAPHML)
    g = read_graphml(spark, str(p))
    assert g.V().count_value() == 3
    assert g.E().count_value() == 2
    rows = g.V().has("name", "ana").out("knows").values("name", "age").collect()
    assert [(r["name"], r["age"]) for r in rows] == [("bo", 41)]
    w = g.E().has_label("knows").values("weight").collect()
    assert [r["weight"] for r in w] == [0.5]


def test_read_graphml_gz(spark, tmp_path):
    p = tmp_path / "g.graphml.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(GRAPHML)
    g = read_graphml(spark, str(p))
    assert g.V().count_value() == 3


def test_graph_store_roundtrip(spark, tmp_path, gods):
    path = str(tmp_path / "store")
    gods.write(path)
    from titan_spark.graph import PropertyGraph
    from titan_spark.sources.gods import gods_schema

    g2 = PropertyGraph.read(spark, path, schema=gods_schema())
    assert g2.V().count_value() == 12
    assert g2.E().count_value() == 17
    # same traversal answers through the store
    assert (
        g2.V().has("name", "hercules").outE("battled").has("time", 12).inV()
        .values("name").collect()[0][0]
        == "cerberus"
    )
    # pushdown reaches the stored parquet
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        g2.V().has("name", "hercules").df.explain("formatted")
    assert "PushedFilters" in buf.getvalue()
    assert "EqualTo(name,hercules)" in buf.getvalue()


def test_edge_write_splits_dominant_label(spark, tmp_path, tpch):
    # repartitionByRange("label","src") must spread the dominant edge
    # label over >1 file — repartition("label") used to write it as a
    # single task/file (a straggler and a one-split read at scale)
    from pyspark.sql import functions as F

    path = str(tmp_path / "store")
    # sf0.001 edges are tiny, so AQE rightly coalesces the range
    # exchange down to one partition; disable coalescing to observe the
    # at-scale layout (where partitions carry ~64 MB and never merge)
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        tpch.write(path)
    finally:
        spark.conf.set(key, prev)
    edges = spark.read.parquet(f"{path}/edges")
    dom = (
        edges.groupBy("label").count().orderBy(F.desc("count")).first()["label"]
    )
    n_files = (
        edges.filter(F.col("label") == dom)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert n_files > 1, f"dominant label {dom!r} written as a single file"
