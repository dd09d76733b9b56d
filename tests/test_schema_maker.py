"""DefaultSchemaMaker analog + property-key TTL + ~visibility.

Reference: core/schema/DefaultSchemaMaker.java (auto type creation,
behavior test TitanGraphTest.java:1163), TitanManagement.java:290
setTTL on property keys, ImplicitKey.java:28-46.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from titan_spark.graph import PropertyGraph
from titan_spark.schema import Cardinality, GraphSchema, SchemaViolation


def _tiny_graph(spark, maker="default"):
    v = spark.createDataFrame([(1, "person", "alice")], "id long, label string, name string")
    e = spark.createDataFrame([(10, 1, 1, "knows")], "edge_id long, src long, dst long, label string")
    schema = GraphSchema(maker=maker)
    schema.make_vertex_label("person")
    schema.make_edge_label("knows")
    schema.make_property_key("name", "string")
    return PropertyGraph(v, e, schema=schema)


def test_default_maker_auto_creates_types(spark):
    g = _tiny_graph(spark)
    new_v = spark.createDataFrame(
        [(2, "robot", 7)], "id long, label string, power long"
    )
    g2 = g.add_vertices(new_v)
    # undeclared label and key were registered with Titan defaults
    assert "robot" in g2.schema.vertex_labels
    pk = g2.schema.property_keys["power"]
    assert pk.data_type == "bigint" and pk.cardinality == Cardinality.SINGLE
    new_e = spark.createDataFrame(
        [(11, 1, 2, "owns", 0.5)], "edge_id long, src long, dst long, label string, weight double"
    )
    g3 = g2.add_edges(new_e)
    assert "owns" in g3.schema.edge_labels
    assert "weight" in g3.schema.property_keys
    assert g3.V().count_value() == 2 and g3.E().count_value() == 2


def test_none_maker_rejects_undeclared(spark):
    g = _tiny_graph(spark, maker="none")
    with pytest.raises(SchemaViolation, match="vertex label"):
        g.add_vertices(
            spark.createDataFrame([(2, "robot")], "id long, label string")
        )
    with pytest.raises(SchemaViolation, match="property key"):
        g.add_vertices(
            spark.createDataFrame([(2, "person", 7)], "id long, label string, power long")
        )
    with pytest.raises(SchemaViolation, match="edge label"):
        g.add_edges(
            spark.createDataFrame([(11, 1, 1, "owns")], "edge_id long, src long, dst long, label string")
        )
    # declared writes still pass in strict mode
    g2 = g.add_vertices(
        spark.createDataFrame([(2, "person", "bob")], "id long, label string, name string")
    )
    assert g2.V().count_value() == 2


def test_property_key_ttl_filter(spark):
    schema = GraphSchema()
    schema.make_property_key("session_token", "string", ttl_seconds=3600)
    schema.make_property_key("name", "string")
    now = datetime.datetime(2026, 1, 1, 12, 0, 0)
    vp = spark.createDataFrame(
        [
            (1, "session_token", "fresh", now - datetime.timedelta(seconds=600)),
            (1, "session_token", "stale", now - datetime.timedelta(seconds=7200)),
            (1, "name", "old-but-no-ttl", now - datetime.timedelta(days=400)),
            (2, "session_token", "no-ts-passes", None),
        ],
        "vertex_id long, key string, value string, _ts timestamp",
    )
    kept = {
        r["value"]
        for r in schema.property_ttl_filter(vp, now_expr=F.lit(now)).collect()
    }
    assert kept == {"fresh", "old-but-no-ttl", "no-ts-passes"}


def test_visibility_implicit_key(spark):
    v = spark.createDataFrame(
        [(1, "person", "normal"), (2, "person", "hidden")],
        "id long, label string, _vis string",
    )
    e = spark.createDataFrame([], "edge_id long, src long, dst long, label string")
    g = PropertyGraph(v, e)
    t = g.V()
    rows = t.to_df(t.col("id").alias("id"), t.col("~visibility").alias("vis")).collect()
    assert {(r["id"], r["vis"]) for r in rows} == {(1, "normal"), (2, "hidden")}
    # absent metadata column → NULL, never an error
    g2 = PropertyGraph(v.drop("_vis"), e)
    t2 = g2.V()
    assert [r["vis"] for r in t2.to_df(t2.col("~visibility").alias("vis")).collect()] == [None, None]


def test_schema_describe_print_schema_analog():
    from titan_spark.schema import Cardinality, GraphSchema, Multiplicity

    s = GraphSchema()
    s.make_vertex_label("person")
    s.make_vertex_label("god", static=True)
    s.make_edge_label(
        "battled", Multiplicity.MULTI, sort_key=("time",),
        src_labels=("person",), dst_labels=("monster",),
    )
    s.make_property_key("age", "int", Cardinality.SINGLE)
    s.make_property_key("nicknames", "string", Cardinality.SET)
    out = s.describe()
    assert "--- Vertex Labels ---" in out and "god: partitioned=False, static=True" in out
    assert "battled: MULTI" in out and "sortKey=['time']" in out
    assert "['person'] -> ['monster']" in out
    assert "age: int, SINGLE" in out and "nicknames: string, SET" in out


def test_index_lifecycle_and_force_index(spark):
    """TitanManagement.buildIndex/updateIndex lifecycle + the
    query.force-index guard (docs/indexes.txt; SchemaStatus.java)."""
    import pytest

    from titan_spark.graph import PropertyGraph
    from titan_spark.schema import (
        GraphSchema,
        IndexStatus,
        SchemaAction,
        SchemaViolation,
    )

    v = spark.createDataFrame(
        [(1, "person", "a"), (2, "person", "b")], "id long, label string, name string"
    )
    e = spark.createDataFrame([], "edge_id long, src long, dst long, label string")
    s = GraphSchema()
    s.make_property_key("name", "string")
    g = PropertyGraph(v, e, schema=s)

    s.build_index("byName", ["name"])
    # ENABLE before REGISTER is an illegal transition
    with pytest.raises(SchemaViolation):
        s.update_index("byName", SchemaAction.ENABLE_INDEX)
    s.update_index("byName", SchemaAction.REGISTER_INDEX)
    s.update_index("byName", SchemaAction.ENABLE_INDEX)
    s.await_index_status("byName", IndexStatus.ENABLED)

    # force-index: covered key passes, uncovered key raises; off = scan
    s.force_index = True
    assert g.V().has("name", "a").count_value() == 1
    with pytest.raises(SchemaViolation):
        g.V().has("label", "person")
    s.force_index = False
    assert g.V().has("label", "person").count_value() == 2


def test_unique_index_violations(spark):
    from titan_spark.graph import PropertyGraph
    from titan_spark.schema import GraphSchema

    v = spark.createDataFrame(
        [(1, "person", "dup"), (2, "person", "dup"), (3, "person", "ok")],
        "id long, label string, name string",
    )
    s = GraphSchema()
    s.build_index("uByName", ["name"], unique=True)
    viols = s.unique_violations(v, "uByName").collect()
    assert len(viols) == 1 and viols[0]["name"] == "dup" and viols[0]["n"] == 2


def test_consistency_modifier_shim():
    """mgmt.setConsistency parity (docs/eventualconsistency.txt):
    LOCK records on keys/indexes, FORK only on edge labels, unknown
    elements rejected; DEFAULT when undeclared."""
    import pytest

    from titan_spark.schema import (
        ConsistencyModifier,
        GraphSchema,
        SchemaViolation,
    )

    s = GraphSchema()
    s.make_property_key("consistentName")
    s.build_index("byConsistentName", ["consistentName"], unique=True)
    s.make_edge_label("related")
    s.set_consistency("consistentName", ConsistencyModifier.LOCK)
    s.set_consistency("byConsistentName", ConsistencyModifier.LOCK)
    s.set_consistency("related", ConsistencyModifier.FORK)
    assert s.consistency_of("consistentName") is ConsistencyModifier.LOCK
    assert s.consistency_of("related") is ConsistencyModifier.FORK
    assert s.consistency_of("undeclared_edge") is ConsistencyModifier.DEFAULT
    with pytest.raises(SchemaViolation):
        s.set_consistency("consistentName", ConsistencyModifier.FORK)
    with pytest.raises(SchemaViolation):
        s.set_consistency("ghost", ConsistencyModifier.LOCK)


def test_describe_includes_indexes_and_consistency():
    from titan_spark.schema import ConsistencyModifier, GraphSchema, SchemaAction

    s = GraphSchema()
    s.make_property_key("name")
    s.build_index("byName", ["name"], unique=True)
    s.update_index("byName", SchemaAction.REGISTER_INDEX)
    s.update_index("byName", SchemaAction.ENABLE_INDEX)
    s.set_consistency("byName", ConsistencyModifier.LOCK)
    out = s.describe()
    assert "byName: vertex/composite/unique on ['name'], status=ENABLED" in out
    assert "byName: LOCK" in out
