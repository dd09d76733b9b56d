"""Regression tests for lazy-vertex-frontier correctness.

The lazy fold (endpoint steps defer the vertex-table join) must never
change traversal results. Round-1 advisory found two silent-wrong-answer
paths: has_label() on a lazy frontier bound ``label`` to the underlying
edge table, and simple_path_excluding() cleared the lazy flag without
materializing, turning every later property access into NULL.
"""

from pyspark.sql import functions as F

from titan_spark.graph import PropertyGraph


def test_has_label_after_hop(gods):
    # hercules battled 3 monsters; hasLabel after the reverse hop must
    # filter the *vertex* label, not the edge label underneath the
    # lazy projection (TitanGraphTest hasLabel-after-hop surface)
    t = gods.V().has_label("monster").in_("battled").has_label("demigod")
    assert t.count_value() == 3
    names = [r["name"] for r in t.values("name").collect()]
    assert names == ["hercules"] * 3


def test_has_label_after_hop_no_match(gods):
    # the battled origins are all demigods — a 'god' restriction must
    # return nothing (not silently match edge labels)
    assert gods.V().has_label("monster").in_("battled").has_label("god").count_value() == 0


def test_has_label_after_hop_guaranteed_subset_stays_lazy(tpch):
    # in_region's dst side is guaranteed ('region',) by schema endpoint
    # metadata: the label filter is a no-op and the frontier stays lazy
    t = tpch.V().has_label("nation").out("in_region").has_label("region")
    assert t._lazy_v is True
    assert t.count_value() == 25
    # and property access after the no-op filter still materializes
    names = {r["name"] for r in t.dedup().values("name").collect()}
    assert len(names) == 5


def test_simple_path_excluding_preserves_properties(gods):
    # advisory repro: values() after simple_path_excluding returned
    # [None x 6] because the lazy flag was dropped without materializing
    rows = (
        gods.V()
        .has_label("god")
        .as_("a")
        .out("brother")
        .out("brother")
        .simple_path_excluding("a")
        .values("name")
        .collect()
    )
    names = [r["name"] for r in rows]
    assert len(names) == 6
    assert all(n is not None for n in names)
    assert sorted(set(names)) == ["jupiter", "neptune", "pluto"]


def test_implicit_timestamp_on_lazy_frontier(spark):
    # ~timestamp on a lazy frontier must materialize and read the
    # vertex table's _ts, not short-circuit to NULL
    v = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 200)], "id long, label string, _ts long"
    )
    e = spark.createDataFrame([(1, 1, 2, "e")], "edge_id long, src long, dst long, label string")
    g = PropertyGraph(v, e)
    t = g.V().has_id(1).out("e")
    ts = [r["ts"] for r in t.df.select(t.col("~timestamp").alias("ts")).collect()]
    assert ts == [200]


def test_where_within_keeps_lazy_frontier_properties(tpch):
    # semi-join steps inherit the lazy flag; property access afterwards
    # must still materialize correctly
    t = tpch.V().has_label("nation").aggregate_("n").out("in_region")
    assert t._lazy_v is True
    rows = t.dedup().values("name").collect()
    assert len(rows) == 5
    assert all(r["name"] is not None for r in rows)
