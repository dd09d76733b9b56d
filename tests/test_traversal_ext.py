"""Branch/filter step extensions: union, choose, where, not, path."""

from pyspark.sql import functions as F

from titan_spark.operators.traversal import P


def test_union_step(gods):
    f = gods.V().has("name", "hercules").out("father")
    m = gods.V().has("name", "hercules").out("mother")
    names = sorted(r["name"] for r in f.union_(m).values("name").collect())
    assert names == ["alcmene", "jupiter"]


def test_choose_step(gods):
    # gods -> father hop; others stay put (identity branch)
    t = gods.V().choose(
        F.col("label") == "demigod",
        lambda x: x.out("father"),
    )
    # hercules routed through father (jupiter); everyone else unchanged
    assert t.count_value() == 12  # 11 identity + 1 father target
    assert t.has("name", "jupiter").count_value() == 2  # itself + via hercules


def test_where_subtraversal(gods):
    # vertices having at least one battled edge with time > 1
    t = gods.V().where_(lambda x: x.outE("battled").has("time", P.gt(1)))
    assert [r["name"] for r in t.values("name").collect()] == ["hercules"]


def test_not_subtraversal(gods):
    # gods that do NOT live anywhere
    t = gods.V().has_label("god").not_(lambda x: x.outE("lives"))
    assert t.count_value() == 0  # all three gods live somewhere
    t2 = gods.V().has_label("monster").not_(lambda x: x.outE("lives"))
    assert sorted(r["name"] for r in t2.values("name").collect()) == ["hydra", "nemean"]


def test_path_ids(gods):
    t = gods.V().has("name", "hercules").as_("a").out("father").as_("b").out("father")
    df = t.to_df(t.path_ids("a", "b").alias("path"))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["path"] == [6, 4, 1]  # hercules -> jupiter -> saturn


def test_bag_semantics_preserved(gods):
    # jupiter and neptune are both brothers of pluto twice over (two
    # directed edges each way); out+in traversers must not collapse
    t = gods.V().has("name", "pluto").both("brother")
    assert t.count_value() == 4  # 2 out + 2 in
    assert t.dedup().count_value() == 2


def test_aggregate_where_without(gods):
    # gods' fathers collected into a set; expanding brothers/battled
    # and anti-joining the set drops collected ids
    t = (
        gods.V()
        .has("name", "hercules")
        .out("father")
        .aggregate_("dads")
        .out("brother")
        .where_without("dads")
        .dedup()
    )
    names = sorted(r["name"] for r in t.values("name").collect())
    assert names == ["neptune", "pluto"]


def test_aggregate_where_within(gods):
    # within = semi-join back into the collected set
    t = (
        gods.V()
        .has("name", "hercules")
        .out("father")
        .aggregate_("dads")
        .out("brother")
        .out("brother")
        .where_within("dads")
        .dedup()
    )
    names = sorted(r["name"] for r in t.values("name").collect())
    assert names == ["jupiter"]


def test_store_alias_and_missing_set(gods):
    t = gods.V().has_label("god").store_("gods")
    assert sorted(r["name"] for r in t.where_within("gods").values("name").collect()) == [
        "jupiter", "neptune", "pluto"
    ]
    try:
        gods.V().where_within("nope")
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_coalesce_first_branch_wins(gods):
    # hercules has a father -> mother branch never fires for him
    t = gods.V().has("name", "hercules").coalesce_(
        lambda x: x.out("father"), lambda x: x.out("mother")
    )
    assert [r["name"] for r in t.values("name").collect()] == ["jupiter"]


def test_coalesce_fallback_branch(gods):
    # jupiter has a father (saturn); saturn has none -> falls through
    # to the brother branch
    t = gods.V().has_label("god", "titan").coalesce_(
        lambda x: x.out("father"), lambda x: x.out("brother")
    )
    names = sorted(r["name"] for r in t.values("name").collect())
    # jupiter->saturn (father); neptune/pluto have no father -> their
    # brothers: neptune->{jupiter,pluto}, pluto->{jupiter,neptune}
    assert names == ["jupiter", "jupiter", "neptune", "pluto", "saturn"]


def test_optional_identity(gods):
    # gods with a father move there; the rest stay put
    t = gods.V().has_label("god", "titan").optional_(lambda x: x.out("father"))
    names = sorted(r["name"] for r in t.values("name").collect())
    # jupiter -> saturn; neptune, pluto, saturn unchanged
    assert names == ["neptune", "pluto", "saturn", "saturn"]


def test_geo_shape_intersect(spark):
    # Geo.java:18-72 shape-vs-shape INTERSECT: circle-circle, box-box,
    # circle-box (clamp-to-nearest-point on the haversine sphere)
    from pyspark.sql import functions as F

    from titan_spark.functions.geo import (
        boxes_intersect,
        circle_box_intersect,
        circles_intersect,
    )

    circles = spark.createDataFrame(
        [
            (1, 0.0, 0.0, 100.0),   # ~1113 km from (10,0): 100+1000 < gap -> miss
            (2, 5.0, 0.0, 100.0),   # ~556 km: 100+1000 covers -> hit
            (3, 10.0, 0.0, 5.0),    # concentric-ish: 0 distance -> hit
        ],
        "id long, lat double, lon double, r double",
    )
    got = {
        r["id"]
        for r in circles.filter(
            circles_intersect("lat", "lon", F.col("r"), 10.0, 0.0, 1000.0)
        ).collect()
    }
    assert got == {2, 3}

    boxes = spark.createDataFrame(
        [
            (1, 0.0, 0.0, 5.0, 5.0),     # overlaps corner of query box
            (2, 6.0, 6.0, 8.0, 8.0),     # fully inside
            (3, 20.0, 20.0, 30.0, 30.0), # disjoint
            (4, 10.0, 0.0, 20.0, 4.0),   # edge-touch at lat=10 counts (closed)
        ],
        "id long, lo_lat double, lo_lon double, hi_lat double, hi_lon double",
    )
    got = {
        r["id"]
        for r in boxes.filter(
            boxes_intersect("lo_lat", "lo_lon", "hi_lat", "hi_lon", 4.0, 3.0, 10.0, 10.0)
        ).collect()
    }
    assert got == {1, 2, 4}

    cb = spark.createDataFrame(
        [
            (1, 0.0, 0.0, 100.0),   # nearest box point (4,0) ~445km away -> miss
            (2, 0.0, 0.0, 500.0),   # -> hit
            (3, 5.0, 5.0, 1.0),     # center inside box -> hit at any radius
        ],
        "id long, lat double, lon double, r double",
    )
    got = {
        r["id"]
        for r in cb.filter(
            circle_box_intersect("lat", "lon", F.col("r"), 4.0, -10.0, 10.0, 10.0)
        ).collect()
    }
    assert got == {2, 3}


def test_mapping_legality_shim(spark):
    # Mapping.java:16-21 / ElasticSearchIndex.java:957-984: warn when a
    # predicate would be rejected by a reference mixed index with the
    # key's declared mapping; compute the result anyway
    import warnings

    import pytest
    from titan_spark.functions.predicates import P
    from titan_spark.schema import Mapping
    from titan_spark.sources.gods import graph_of_the_gods

    g = graph_of_the_gods(spark)
    g.schema.make_property_key("name", "string", mapping=Mapping.STRING)
    g.schema.make_property_key("reason", "string", mapping=Mapping.TEXT)

    with pytest.warns(UserWarning, match="Mapping.STRING"):
        t = g.V().has("name", P.text_contains("hercules"))
    assert t.count_value() == 1  # still computed

    with pytest.warns(UserWarning, match="Mapping.TEXT"):
        g.E().has("reason", P.text_prefix("loves"))
    with pytest.warns(UserWarning, match="Mapping.TEXT"):
        g.E().has("reason", "loves waves")  # Cmp.EQUAL illegal on TEXT

    # legal combinations stay silent (warnings escalated to errors)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        g.V().has("name", P.text_prefix("herc"))
        g.V().has("name", "hercules")
        g.E().has("reason", P.text_contains("waves"))
        g.V().has("age", P.gt(100))  # unmapped key: never warns

    # TEXTSTRING permits everything
    g.schema.make_property_key("name", "string", mapping=Mapping.TEXTSTRING)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        g.V().has("name", P.text_contains("hercules"))
        g.V().has("name", P.text_regex("herc.*"))

    # Cmp order predicates (P.lt/gte/...) are rejected by the reference
    # on BOTH string mappings (ElasticSearchIndex.supports() admits only
    # EQUAL/NOT_EQUAL/PREFIX/REGEX for STRING, CONTAINS* for TEXT)
    g.schema.make_property_key("name", "string", mapping=Mapping.STRING)
    with pytest.warns(UserWarning, match="Mapping.STRING"):
        g.V().has("name", P.gte("a"))
    with pytest.warns(UserWarning, match="Mapping.TEXT"):
        g.E().has("reason", P.lt("z"))
    with pytest.warns(UserWarning, match="Mapping.TEXT"):
        g.E().has("reason", P.between("a", "z"))


def test_coin_constant_ids_labels(gods):
    # coin: deterministic subset, repeatable, and monotone in p
    few = {r["id"] for r in gods.V().coin_(0.3).ids().collect()}
    again = {r["id"] for r in gods.V().coin_(0.3).ids().collect()}
    more = {r["id"] for r in gods.V().coin_(0.9).ids().collect()}
    assert few == again and few <= more
    assert 0 < len(few) < 12
    # coin(1.0) keeps everyone
    assert gods.V().coin_(1.0).count_value() == 12
    # constant maps each traverser to the literal
    rows = gods.V().has_label("god").constant_("x").collect()
    assert [r["constant"] for r in rows] == ["x"] * 3
    # label() projects the element label, incl. after a hop
    labs = {r["label"] for r in gods.V().has("name", "hercules").out("father").labels().collect()}
    assert labs == {"god"}


def test_tail_skip_steps(gods):
    # tail(2) of age ascending = the two oldest; original order contract
    ages = sorted(
        r["age"] for r in gods.V().has("age", P.neq(None)).values("age").collect()
    )
    got = sorted(
        r["age"]
        for r in gods.V().has("age", P.neq(None)).tail_(2, "age").values("age").collect()
    )
    assert got == ages[-2:]
    skipped = sorted(
        r["age"]
        for r in gods.V().has("age", P.neq(None)).skip_(2, "age").values("age").collect()
    )
    assert skipped == ages[2:]
    # tail+skip partition the ordered stream
    assert sorted(got + sorted(
        r["age"] for r in gods.V().has("age", P.neq(None)).range_(2, len(ages) - 2, "age").values("age").collect()
    )) == sorted(ages[2:])[: len(ages) - 2]


def test_math_step(gods):
    t = (
        gods.V()
        .has("name", "hercules")
        .math_("(a - 30) / 1000", name="centuries", a="age")
    )
    rows = t.df.collect()
    assert len(rows) == 1
    assert abs(rows[0]["centuries"] - (30 - 30) / 1000) < 1e-9 or rows[0]["centuries"] == 0.0


def test_math_step_with_tags(gods):
    t = (
        gods.V()
        .has("name", "hercules")
        .as_("h")
        .out("father")
        .math_("f_age - h_age", name="age_gap", f_age="age", h_age="h.age")
    )
    rows = t.df.collect()
    assert len(rows) == 1
    assert rows[0]["age_gap"] == 5000 - 30


def test_barrier_preserves_frontier(gods):
    t = gods.V().has_label("god").barrier_().out("brother")
    plain = gods.V().has_label("god").out("brother")
    assert sorted(r["id"] for r in t.df.collect()) == sorted(
        r["id"] for r in plain.df.collect()
    )


def test_value_map_with_tokens(gods):
    rows = gods.V().has("name", "hercules").value_map("name", with_tokens=True).collect()
    assert len(rows) == 1
    assert rows[0]["label"] == "demigod" and rows[0]["name"] == "hercules"
    assert rows[0]["id"] is not None


def test_shuffle_step_deterministic_permutation(gods):
    a = [r["name"] for r in gods.V().shuffle_().values("name").collect()]
    b = [r["name"] for r in gods.V().shuffle_().values("name").collect()]
    assert a == b and sorted(a) == sorted(
        r["name"] for r in gods.V().values("name").collect()
    )
    # not the id order, and a different seed permutes differently
    ids = [r["id"] for r in gods.V().shuffle_().df.select("id").collect()]
    assert ids != sorted(ids)
    c = [r["name"] for r in gods.V().shuffle_(seed=9).values("name").collect()]
    assert c != a
    # shuffle feeds range_/tail_ slicing without explicit specs
    head2 = [r["name"] for r in gods.V().shuffle_().limit(2).values("name").collect()]
    assert head2 == a[:2]


def test_peer_pressure_alias(gods):
    from titan_spark.compute import label_propagation, peer_pressure

    lp = {(r["id"], r["community"]) for r in label_propagation(gods, 2).collect()}
    pp = {(r["id"], r["cluster"]) for r in peer_pressure(gods, 2).collect()}
    assert lp == pp
