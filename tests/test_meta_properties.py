"""Meta-properties: properties on vertex-properties (docs/advschema.txt:72)."""

from pyspark.sql import functions as F

from titan_spark.graph import PropertyGraph
from titan_spark.schema import Cardinality, GraphSchema


def test_meta_property_query(spark):
    v = spark.createDataFrame([(1, "person"), (2, "person")], "id long, label string")
    e = spark.createDataFrame([], "edge_id long, src long, dst long, label string")
    # LIST-cardinality 'degree' property with meta-properties
    # (institution, year) on each property instance
    vp = spark.createDataFrame(
        [
            (1, "degree", "bs", 101, "mit", 2001),
            (1, "degree", "phd", 102, "stanford", 2006),
            (2, "degree", "bs", 103, "mit", 1999),
        ],
        "vertex_id long, key string, value string, prop_id long, "
        "institution string, year int",
    )
    s = GraphSchema()
    s.make_property_key("degree", "string", Cardinality.LIST)
    g = PropertyGraph(v, e, vp, s)

    # all property instances for the frontier
    props = g.V().properties_("degree")
    assert props.count() == 3
    # meta-property predicate: degrees earned at MIT
    mit = props.filter(F.col("institution") == "mit")
    assert sorted((r["vertex_id"], r["value"]) for r in mit.collect()) == [
        (1, "bs"),
        (2, "bs"),
    ]
    # frontier restriction flows through
    p1 = g.V().has_id(1).properties_("degree").filter(F.col("year") > 2002)
    assert [r["value"] for r in p1.collect()] == ["phd"]


def test_properties_has_value(spark):
    v = spark.createDataFrame([(1, "person"), (2, "person")], "id long, label string")
    e = spark.createDataFrame([], "edge_id long, src long, dst long, label string")
    vp = spark.createDataFrame(
        [
            (1, "degree", "bs", 101),
            (1, "degree", "phd", 102),
            (2, "degree", "bs", 103),
        ],
        "vertex_id long, key string, value string, prop_id long",
    )
    s = GraphSchema()
    s.make_property_key("degree", "string", Cardinality.LIST)
    g = PropertyGraph(v, e, vp, s)
    rows = g.V().properties_("degree", has_value="bs").collect()
    assert len(rows) == 2
    assert all(r["value"] == "bs" for r in rows)


def test_properties_meta_has(spark):
    """Mid-traversal meta-property has(): properties_(key,
    meta={metaKey: value-or-P}) filters the property stream on its
    meta columns (reference: properties().has(...) in the
    ProcessStandardSuite, BerkeleyTitanProcessTest.java:12-15)."""
    import pytest

    from titan_spark.functions.predicates import P

    v = spark.createDataFrame([(1, "person"), (2, "person")], "id long, label string")
    e = spark.createDataFrame([], "edge_id long, src long, dst long, label string")
    vp = spark.createDataFrame(
        [
            (1, "degree", "bs", 101, "mit", 2001),
            (1, "degree", "phd", 102, "stanford", 2006),
            (2, "degree", "bs", 103, "mit", 1999),
        ],
        "vertex_id long, key string, value string, prop_id long, "
        "institution string, year int",
    )
    from titan_spark.graph import PropertyGraph
    from titan_spark.schema import Cardinality, GraphSchema

    s = GraphSchema()
    s.make_property_key("degree", "string", Cardinality.LIST)
    g = PropertyGraph(v, e, vp, s)
    # exact-value meta filter
    mit = g.V().properties_("degree", meta={"institution": "mit"})
    assert sorted((r["vertex_id"], r["value"]) for r in mit.collect()) == [
        (1, "bs"),
        (2, "bs"),
    ]
    # predicate meta filter + has_value predicate compose
    late = g.V().properties_("degree", meta={"year": P.gt(2000)})
    assert sorted(r["value"] for r in late.collect()) == ["bs", "phd"]
    both = g.V().properties_(
        "degree", has_value=P.within("bs", "phd"), meta={"institution": "stanford"}
    )
    assert [r["value"] for r in both.collect()] == ["phd"]
    # unknown meta column is an explicit error, not a silent no-op
    with pytest.raises(ValueError, match="meta-property"):
        g.V().properties_("degree", meta={"nope": 1})
