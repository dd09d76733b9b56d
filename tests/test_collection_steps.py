"""Generic collection steps — GroupStep (two-by form), Fold/Unfold,
Project, Inject, SideEffectCap, Subgraph — ProcessStandardSuite surface
the reference passes wholesale (BerkeleyTitanProcessTest.java:12-15).

Collected lists are emitted sorted (deterministic, oracle-comparable
divergence from Gremlin's iteration-order lists)."""

import pytest
from pyspark.sql import functions as F

from titan_spark.operators.traversal import inject_values, unfold


def _id_of(g, name):
    return g.V().has("name", name).df.select("id").first()[0]


# ------------------------------------------------------------------- group


def test_group_default_folds_element_ids(gods):
    out = {r["key"]: r["value"] for r in gods.V().group_("label").collect()}
    god_ids = sorted(r["id"] for r in gods.V().has_label("god").df.select("id").collect())
    assert out["god"] == god_ids
    assert len(out["monster"]) == 3


def test_group_two_by_with_agg(gods):
    # group().by('label').by(values('age').sum())
    out = {r["key"]: r["value"] for r in gods.V().group_("label", "age", agg="sum").collect()}
    # gods: jupiter 5000 + neptune 4500 + pluto 4000
    assert out["god"] == 13500
    assert out["demigod"] == 30  # hercules
    out_mean = {
        r["key"]: r["value"] for r in gods.V().group_("label", "age", agg="mean").collect()
    }
    assert out_mean["god"] == pytest.approx(4500.0)


def test_group_after_hop_uses_tag_value(gods):
    # per-father sum of sons' ages: son tagged, hop to father, group
    t = gods.V().as_("s").out("father")
    out = {r["key"]: r["value"]
           for r in t.group_("name", F.col("_t_s.age"), agg="sum").collect()}
    assert out["jupiter"] == 30  # hercules
    assert out["saturn"] == 5000  # jupiter


def test_group_rejects_unknown_agg(gods):
    with pytest.raises(ValueError, match="unknown group agg"):
        gods.V().group_("label", "age", agg="median")


# -------------------------------------------------------------- fold/unfold


def test_fold_and_unfold_roundtrip(gods):
    folded = gods.V().has_label("god").fold("name")
    [row] = folded.collect()
    assert row["folded"] == ["jupiter", "neptune", "pluto"]
    back = unfold(folded, "folded", alias="name")
    assert sorted(r["name"] for r in back.collect()) == ["jupiter", "neptune", "pluto"]


def test_fold_default_collects_ids(gods):
    [row] = gods.V().has_label("god").fold().collect()
    assert len(row["folded"]) == 3 and row["folded"] == sorted(row["folded"])


# ----------------------------------------------------------------- project


def test_project_named_columns(gods):
    rows = (
        gods.V().has_label("god")
        .project_(who="name", years="age", label_len=F.length("label"))
        .collect()
    )
    got = {r["who"]: (r["years"], r["label_len"]) for r in rows}
    assert got["jupiter"] == (5000, 3) and set(got) == {"jupiter", "neptune", "pluto"}


# ------------------------------------------------------------------ inject


def test_inject_appends_vertices_bag_semantics(gods):
    herc = _id_of(gods, "hercules")
    jup = _id_of(gods, "jupiter")
    t = gods.V().has_label("god")
    assert t.inject_(herc).count_value() == 4
    # injecting an id already in the frontier duplicates it (bag)
    assert t.inject_(jup).count_value() == 4
    assert t.inject_(herc, jup).count_value() == 5


def test_inject_values_scalar_stream(gods):
    names = gods.V().has_label("god").values("name")
    out = sorted(r["name"] for r in inject_values(names, "zeus").collect())
    assert out == ["jupiter", "neptune", "pluto", "zeus"]
    with pytest.raises(ValueError, match="single-column"):
        inject_values(gods.V().df.select("id", "name"), 1)


# --------------------------------------------------------------------- cap


def test_store_cap_emits_folded_set(gods):
    t = gods.V().has_label("god").store_("gods").out("brother")
    [row] = t.cap_("gods").collect()
    god_ids = sorted(r["id"] for r in gods.V().has_label("god").df.select("id").collect())
    assert row["gods"] == god_ids


# ---------------------------------------------------------------- subgraph


def test_subgraph_edge_induced(gods):
    sub = gods.E().has_label("brother").subgraph_()
    assert sub.V().count_value() == 3  # the three gods
    assert sub.E().count_value() == 6  # brother edges both ways
    # the extracted graph supports further traversals with properties
    names = sorted(r["name"] for r in sub.V().values("name").collect())
    assert names == ["jupiter", "neptune", "pluto"]
    # an existing algorithm runs on the extraction unchanged
    from titan_spark.compute import degree_count

    deg = {r["id"]: r["degree"] for r in degree_count(sub).collect()}
    assert set(deg.values()) == {4}  # each god: 2 out + 2 in brother edges


def test_subgraph_requires_edge_frontier(gods):
    with pytest.raises(ValueError, match="requires a E frontier"):
        gods.V().subgraph_()


# ------------------------------------------- collection-field predicates


def test_collection_field_predicate_array_column(spark):
    # SET-cardinality key stored as array<string>: ANY-element match via
    # exists() (docs/searchpredicates.txt:131-149)
    from titan_spark.functions.predicates import P
    from titan_spark.graph import PropertyGraph
    from titan_spark.schema import Cardinality, GraphSchema

    v = spark.createDataFrame(
        [(1, "doc", ["Zeus King", "sky father"]), (2, "doc", ["sea lord"]), (3, "doc", None)],
        "id long, label string, aliases array<string>",
    )
    e = spark.createDataFrame([], "edge_id long, src long, dst long, label string")
    s = GraphSchema()
    s.make_property_key("aliases", "array<string>", Cardinality.SET)
    g = PropertyGraph(v, e, schema=s)
    got = [r["id"] for r in g.V().has("aliases", P.text_contains("zeus")).df.select("id").collect()]
    assert got == [1]
    assert g.V().has("aliases", P.text_contains_prefix("se")).count_value() == 1
    assert g.V().has("aliases", P.text_contains("nothing")).count_value() == 0


def test_collection_field_predicate_long_format(spark):
    # LIST-cardinality key in the long-format vertex_properties table:
    # semi-join of vertices owning a matching property row
    from titan_spark.functions.predicates import P
    from titan_spark.graph import PropertyGraph
    from titan_spark.schema import Cardinality, GraphSchema

    v = spark.createDataFrame([(1, "n"), (2, "n")], "id long, label string")
    e = spark.createDataFrame([], "edge_id long, src long, dst long, label string")
    vp = spark.createDataFrame(
        [(1, "qty", 10.0, 100), (1, "qty", 50.0, 101), (2, "qty", 5.0, 102)],
        "vertex_id long, key string, value double, prop_id long",
    )
    s = GraphSchema()
    s.make_property_key("qty", "double", Cardinality.LIST)
    g = PropertyGraph(v, e, vp, schema=s)
    assert [r["id"] for r in g.V().has("qty", P.gte(50.0)).df.select("id").collect()] == [1]
    assert g.V().has("qty", P.lt(1.0)).count_value() == 0
    # multiple matching rows still yield the vertex once (semi-join)
    assert g.V().has("qty", P.gt(1.0)).count_value() == 2
