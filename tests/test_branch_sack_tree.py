"""branch / sack / tree / cyclicPath — the remaining ProcessStandardSuite
steps (BerkeleyTitanProcessTest.java:12-15)."""

import pytest
from pyspark.sql import functions as F


def _id_of(g, name):
    return g.V().has("name", name).df.select("id").first()[0]


# ----------------------------------------------------------------- branch


def test_branch_routes_by_selector(gods):
    # gods branch on label: gods walk brother edges, demigods battle
    t = gods.V()
    out = t.branch_(
        t.col("label"),
        {
            "god": lambda x: x.out("brother"),
            "demigod": lambda x: x.out("battled"),
        },
    )
    names = sorted(r["name"] for r in out.values("name").collect())
    # jupiter->neptune,pluto; neptune->jupiter,pluto; pluto->jupiter,neptune
    # hercules->nemean,hydra,cerberus
    assert names == sorted(
        ["neptune", "pluto", "jupiter", "pluto", "jupiter", "neptune",
         "nemean", "hydra", "cerberus"]
    )


def test_branch_none_catches_unmatched_and_nulls(gods):
    t = gods.V()
    out = t.branch_(
        t.col("label"),
        {"god": lambda x: x.out("brother")},
        none=lambda x: x,  # identity: everything that isn't a god stays
    )
    # 6 brother hops + the 9 non-god vertices
    assert out.count_value() == 6 + 9


def test_branch_any_applies_to_all(gods):
    t = gods.V().has_label("god")
    out = t.branch_(
        t.col("name"),
        {"jupiter": lambda x: x.out("father")},
        any_=lambda x: x,
    )
    # jupiter's father + the 3 gods themselves
    assert out.count_value() == 4


def test_branch_kind_mismatch_raises(gods):
    t = gods.V().has_label("god")
    with pytest.raises(ValueError, match="same element kind"):
        t.branch_(
            t.col("name"),
            {"jupiter": lambda x: x.outE("father"), "neptune": lambda x: x.out("brother")},
        )


def test_branch_null_option_key_routes_once(gods):
    # a None option key claims NULL selectors via eqNullSafe; the `none`
    # branch must NOT double-route them (single Pick dispatch)
    t = gods.V()
    sel = F.when(F.col("label") == "god", F.col("name"))  # NULL for non-gods
    out = t.branch_(
        sel,
        {None: lambda x: x, "jupiter": lambda x: x.out("father")},
        none=lambda x: x,
    )
    # 9 non-gods via the None key, jupiter's 1 father hop, 2 other gods
    # via none — each traverser routed exactly once
    assert out.count_value() == 9 + 1 + 2


# ------------------------------------------------------------------- sack


def test_sack_requires_operand(gods):
    with pytest.raises(ValueError, match="requires a value"):
        gods.V().with_sack(0).sack_("sum")


def test_sack_sum_along_hops(gods):
    # carry the battle time into the sack, one value per traverser
    rows = (
        gods.V()
        .has("name", "hercules")
        .with_sack(0)
        .outE("battled")
        .sack_("sum", "time")
        .inV()
        .sack_values("name")
        .collect()
    )
    got = {r["name"]: r["sack"] for r in rows}
    assert got == {"nemean": 1, "hydra": 2, "cerberus": 12}


def test_sack_accumulates_across_rounds(gods):
    # sum ages up the father chain: jupiter (5000) + saturn (10000)
    rows = (
        gods.V()
        .has("name", "hercules")
        .with_sack(0)
        .out("father")
        .sack_("sum", "age")
        .out("father")
        .sack_("sum", "age")
        .sack_values("name")
        .collect()
    )
    assert len(rows) == 1 and rows[0]["sack"] == 15000 and rows[0]["name"] == "saturn"


def test_sack_ops(gods):
    t = gods.V().has("name", "hercules").with_sack(10)
    assert t.sack_("mult", F.lit(3)).sack_values().first()["sack"] == 30
    assert t.sack_("minus", F.lit(4)).sack_values().first()["sack"] == 6
    assert t.sack_("assign", "age").sack_values().first()["sack"] == 30
    assert t.sack_("min", F.lit(7)).sack_values().first()["sack"] == 7
    assert t.sack_("max", F.lit(99)).sack_values().first()["sack"] == 99
    with pytest.raises(ValueError, match="unknown sack op"):
        t.sack_("xor", F.lit(1))
    with pytest.raises(ValueError, match="with_sack"):
        gods.V().sack_("sum", F.lit(1))


def test_sack_splits_per_traverser(gods):
    # a sack is per-traverser: after a 1->3 fan-out each branch carries
    # its own accumulated value (no cross-traverser mixing)
    rows = (
        gods.V()
        .has("name", "hercules")
        .with_sack(100)
        .outE("battled")
        .sack_("sum", "time")
        .sack_values()
        .collect()
    )
    assert sorted(r["sack"] for r in rows) == [101, 102, 112]


# ------------------------------------------------------------------- tree


def test_tree_two_hop(gods):
    # hercules -> jupiter -> saturn: a single chain of 3 nodes
    rows = (
        gods.V().has("name", "hercules").out("father").out("father").tree().collect()
    )
    h, j, s = (_id_of(gods, n) for n in ("hercules", "jupiter", "saturn"))
    nodes = {r["node_id"]: r for r in rows}
    assert set(nodes) == {h, j, s}
    assert nodes[h]["parent_id"] is None and nodes[h]["depth"] == 1
    assert nodes[j]["parent_id"] == h and nodes[j]["depth"] == 2
    assert nodes[s]["parent_id"] == j and nodes[s]["depth"] == 3


def test_tree_merges_shared_prefixes(gods):
    # 3 battled paths share the hercules root: root counts 3 traversers
    rows = gods.V().has("name", "hercules").out("battled").tree().collect()
    h = _id_of(gods, "hercules")
    root = [r for r in rows if r["parent_id"] is None]
    assert len(root) == 1 and root[0]["node_id"] == h and root[0]["n_traversers"] == 3
    leaves = [r for r in rows if r["parent_id"] == h]
    assert len(leaves) == 3 and all(r["n_traversers"] == 1 for r in leaves)
    assert all(r["depth"] == 2 for r in leaves)


# ------------------------------------------------- simplePath / cyclicPath


def test_cyclic_and_simple_path_partition_traversers(gods):
    # jupiter -brother-> {neptune,pluto} -brother-> {jupiter, other}:
    # 4 two-hop paths, 2 return to jupiter (cyclic), 2 don't (simple)
    base = gods.V().has("name", "jupiter").out("brother").out("brother")
    assert base.count_value() == 4
    cyc = base.cyclic_path()
    simple = base.simple_path()
    assert cyc.count_value() == 2
    assert simple.count_value() == 2
    assert {r["name"] for r in cyc.values("name").collect()} == {"jupiter"}
    assert {r["name"] for r in simple.values("name").collect()} == {"neptune", "pluto"}


def test_simple_path_composes_with_later_steps(gods):
    # the filtered traversal keeps working as a frontier
    out = (
        gods.V()
        .has("name", "jupiter")
        .out("brother")
        .out("brother")
        .simple_path()
        .out("brother")
    )
    # neptune->{jupiter,pluto}, pluto->{jupiter,neptune}
    assert out.count_value() == 4


# ----------------------------------------------------------------- sample


def test_sample_deterministic_subset(gods):
    t = gods.V().has_label("god", "demigod", "monster")
    s3 = t.sample_(3)
    a = sorted(r["id"] for r in s3.df.select("id").collect())
    b = sorted(r["id"] for r in t.sample_(3).df.select("id").collect())
    assert a == b and len(a) == 3  # stable across runs
    full = {r["id"] for r in t.df.select("id").collect()}
    assert set(a) <= full
    c = sorted(r["id"] for r in t.sample_(3, seed=7).df.select("id").collect())
    assert c != a  # different seed, different draw
    # n >= frontier size returns everything
    assert t.sample_(100).count_value() == len(full)
