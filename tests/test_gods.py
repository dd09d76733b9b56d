"""Known-answer tests on Graph of the Gods.

Expected values come from the reference's own assertions
(``TitanIndexTest.java:136-152`` testGraphOfTheGods, and the
docs examples ``docs/searchpredicates.txt:43-66``) — see SURVEY §5.4.
"""

from pyspark.sql import functions as F

from titan_spark.functions import text_contains, geo_within_circle
from titan_spark.operators.traversal import P


def test_vertex_count(gods):
    assert gods.V().count_value() == 12


def test_edge_count(gods):
    assert gods.E().count_value() == 17


def test_label_counts(gods):
    assert gods.V().has_label("god").count_value() == 3
    assert gods.V().has_label("location").count_value() == 3
    assert gods.V().has_label("monster").count_value() == 3


def test_name_unique_lookup(gods):
    rows = gods.V().has("name", "hercules").values("name", "age").collect()
    assert len(rows) == 1
    assert rows[0]["age"] == 30


def test_father_traversal(gods):
    # hercules -father-> jupiter, age 5000
    rows = gods.V().has("name", "hercules").out("father").values("age").collect()
    assert [r["age"] for r in rows] == [5000]


def test_battled_count_and_interval(gods):
    h = gods.V().has("name", "hercules")
    assert h.outE("battled").count_value() == 3
    # time > 1 -> hydra, cerberus (TitanIndexTest known answer: 2)
    assert h.outE("battled").has("time", P.gt(1)).count_value() == 2
    names = sorted(
        r["name"]
        for r in h.outE("battled").has("time", P.gt(1)).inV().values("name").collect()
    )
    assert names == ["cerberus", "hydra"]


def test_interval_half_open(gods):
    h = gods.V().has("name", "hercules")
    # interval [1, 12) excludes time=12
    assert h.outE("battled").has("time", P.between(1, 12)).count_value() == 2


def test_text_contains_loves(gods):
    # E().has('reason', textContains('loves')).count() == 2
    n = gods.E().filter_(text_contains(F.col("reason"), "loves")).count_value()
    assert n == 2
    # multi-word query: all tokens must match
    n2 = gods.E().filter_(text_contains(F.col("reason"), "loves waves")).count_value()
    assert n2 == 1


def test_geo_within(gods):
    # battles within 50km of (37.97, 23.72) — athens: nemean + hydra (docs example)
    n = (
        gods.E()
        .has_label("battled")
        .filter_(geo_within_circle("place_lat", "place_lon", 37.97, 23.72, 50.0))
        .count_value()
    )
    assert n == 2


def test_both_and_dedup(gods):
    # jupiter brother edges: 2 out + 2 in = 4 incidences, 2 distinct others
    j = gods.V().has("name", "jupiter")
    assert j.bothE("brother").count_value() == 4
    assert j.both("brother").dedup().count_value() == 2


def test_in_traversal(gods):
    # who battled hydra -> hercules
    rows = gods.V().has("name", "hydra").in_("battled").values("name").collect()
    assert [r["name"] for r in rows] == ["hercules"]


def test_two_hop_grandfather(gods):
    rows = (
        gods.V().has("name", "hercules").out("father").out("father").values("name").collect()
    )
    assert [r["name"] for r in rows] == ["saturn"]


def test_local_top_k(gods):
    # hercules' 2 most recent battles by time desc
    rows = (
        gods.V()
        .has("name", "hercules")
        .outE("battled")
        .local_top_k(2, "-time")
        .inV()
        .values("name")
        .collect()
    )
    assert sorted(r["name"] for r in rows) == ["cerberus", "hydra"]


def test_adjacent(gods):
    # is hercules adjacent to cerberus via battled?
    h_id = 6
    c_id = 11
    n = gods.V(h_id).outE("battled").adjacent(c_id).count_value()
    assert n == 1


def test_as_select_tags(gods):
    t = gods.V().has("name", "hercules").as_("h").out("battled").as_("m")
    df = t.select_(("h", "name", "hero"), ("m", "name", "monster"))
    rows = {(r["hero"], r["monster"]) for r in df.collect()}
    assert rows == {("hercules", "nemean"), ("hercules", "hydra"), ("hercules", "cerberus")}


def test_multiplicity_validation(gods):
    # father is MANY2ONE and data obeys it
    bad = gods.schema.multiplicity_violations(gods.edges)
    assert bad.count() == 0


def test_group_count(gods):
    rows = gods.V().group_count("label").collect()
    d = {r["label"]: r["count"] for r in rows}
    assert d == {"titan": 1, "location": 3, "god": 3, "demigod": 1, "human": 1, "monster": 3}


def test_order_limit(gods):
    rows = gods.V().has("age").order_by("-age").limit(2).values("name").collect()
    assert [r["name"] for r in rows] == ["saturn", "jupiter"]


def test_range(gods):
    rows = (
        gods.V().has("age").order_by("-age").range_(1, 3).values("name").collect()
    )
    assert [r["name"] for r in rows] == ["jupiter", "neptune"]
