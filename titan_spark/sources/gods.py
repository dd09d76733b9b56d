"""Graph of the Gods — the reference's canonical example fixture.

Data transcribed from
``titan-core/.../example/GraphOfTheGodsFactory.java:92-127`` (12
vertices, 17 edges, 6 vertex labels; ``father``/``mother`` are
MANY2ONE; ``battled`` carries ``time`` + a Geoshape point; ``lives``
carries a text-indexed ``reason``). Known answers asserted by
``TitanIndexTest.java:136-152`` are used in tests/test_gods.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from titan_spark.graph import PropertyGraph
from titan_spark.schema import GraphSchema, Multiplicity

_V = [
    # (id, label, name, age)
    (1, "titan", "saturn", 10000),
    (2, "location", "sky", None),
    (3, "location", "sea", None),
    (4, "god", "jupiter", 5000),
    (5, "god", "neptune", 4500),
    (6, "demigod", "hercules", 30),
    (7, "human", "alcmene", 45),
    (8, "god", "pluto", 4000),
    (9, "monster", "nemean", None),
    (10, "monster", "hydra", None),
    (11, "monster", "cerberus", None),
    (12, "location", "tartarus", None),
]

_NAME = {name: i for (i, _, name, _) in _V}

_E = [
    # (edge_id, src, dst, label, time, reason, place_lat, place_lon)
    (1, "jupiter", "saturn", "father", None, None, None, None),
    (2, "jupiter", "sky", "lives", None, "loves fresh breezes", None, None),
    (3, "jupiter", "neptune", "brother", None, None, None, None),
    (4, "jupiter", "pluto", "brother", None, None, None, None),
    (5, "neptune", "sea", "lives", None, "loves waves", None, None),
    (6, "neptune", "jupiter", "brother", None, None, None, None),
    (7, "neptune", "pluto", "brother", None, None, None, None),
    (8, "hercules", "jupiter", "father", None, None, None, None),
    (9, "hercules", "alcmene", "mother", None, None, None, None),
    (10, "hercules", "nemean", "battled", 1, None, 38.1, 23.7),
    (11, "hercules", "hydra", "battled", 2, None, 37.7, 23.9),
    (12, "hercules", "cerberus", "battled", 12, None, 39.0, 22.0),
    (13, "pluto", "jupiter", "brother", None, None, None, None),
    (14, "pluto", "neptune", "brother", None, None, None, None),
    (15, "pluto", "tartarus", "lives", None, "no fear of death", None, None),
    (16, "pluto", "cerberus", "pet", None, None, None, None),
    (17, "cerberus", "tartarus", "lives", None, None, None, None),
]


def gods_schema() -> GraphSchema:
    s = GraphSchema()
    s.make_edge_label("father", Multiplicity.MANY2ONE)
    s.make_edge_label("mother", Multiplicity.MANY2ONE)
    s.make_edge_label("battled", sort_key=("time",), sort_desc=True)
    s.make_edge_label("lives")
    s.make_edge_label("pet")
    s.make_edge_label("brother")
    for vl in ("titan", "location", "god", "demigod", "human", "monster"):
        s.make_vertex_label(vl)
    s.make_property_key("name", "string")
    s.make_property_key("age", "int")
    s.make_property_key("time", "int")
    s.make_property_key("reason", "string")
    return s


def graph_of_the_gods(spark: SparkSession) -> PropertyGraph:
    vertices = spark.createDataFrame(
        _V, "id long, label string, name string, age int"
    )
    edges = spark.createDataFrame(
        [
            (eid, _NAME[s], _NAME[d], lbl, t, r, lat, lon)
            for (eid, s, d, lbl, t, r, lat, lon) in _E
        ],
        "edge_id long, src long, dst long, label string, time int, "
        "reason string, place_lat double, place_lon double",
    )
    return PropertyGraph(vertices, edges, schema=gods_schema())
