"""Connected components, triangle counting, near-dup clustering."""

from pyspark.sql import functions as F

from titan_spark.compute import connected_components, triangle_count
from titan_spark.graph import PropertyGraph
from titan_spark.pipeline.dedup import dedup_clusters


def test_connected_components_disconnected(spark):
    # components: {1,2,3} chain, {4,5}, {6} isolated
    v = spark.createDataFrame([(i, "n") for i in range(1, 7)], "id long, label string")
    e = spark.createDataFrame(
        [(1, 2, 1), (2, 2, 3), (3, 5, 4)], "edge_id long, src long, dst long"
    ).withColumn("label", F.lit("x"))
    g = PropertyGraph(v, e)
    cc = {r["id"]: r["component"] for r in connected_components(g).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_connected_components_long_chain(spark):
    # diameter > checkpoint interval: 40-node path
    n = 40
    v = spark.createDataFrame([(i, "n") for i in range(n)], "id long, label string")
    e = spark.createDataFrame(
        [(i, i, i + 1) for i in range(n - 1)], "edge_id long, src long, dst long"
    ).withColumn("label", F.lit("x"))
    cc = connected_components(PropertyGraph(v, e), max_iterations=50)
    assert cc.select("component").distinct().count() == 1


def test_triangle_count_gods(gods):
    # jupiter-neptune-pluto brother edges form ONE undirected triangle
    tri = triangle_count(gods, edge_labels=("brother",))
    rows = {r["id"]: r["triangles"] for r in tri.collect()}
    assert rows[4] == 1 and rows[5] == 1 and rows[8] == 1  # the three gods
    assert sum(rows.values()) == 3  # one triangle touches 3 vertices
    # full graph adds the pluto-cerberus-tartarus triangle
    # (pet 8→11, lives 11→12, lives 8→12): two triangles total
    tri_all = triangle_count(gods)
    assert tri_all.agg(F.sum("triangles")).first()[0] == 6


def test_dedup_clusters_transitive(spark):
    # pairs (1,2),(2,3) and (7,9): clusters {1,2,3}->1 and {7,9}->7
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 9)], "id_a long, id_b long")
    out = {r["doc_id"]: r["cluster_rep"] for r in dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}
