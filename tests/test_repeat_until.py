"""repeat().until() dynamic loops (BFS-style traversal)."""

from pyspark.sql import functions as F


def test_repeat_until_reaches_root(gods):
    # climb father edges from hercules until a vertex with no father
    # (saturn): hercules -> jupiter -> saturn
    t = gods.V().has("name", "hercules").repeat_until(
        lambda x: x.out("father"),
        # until: current vertex has no outgoing father edge — express as
        # "is saturn or is a non-god"; simplest data-driven stop: age>=10000
        lambda x: F.col("age") >= 10000,
        max_times=5,
    )
    names = [r["name"] for r in t.values("name").collect()]
    assert names == ["saturn"]


def test_repeat_until_emit_collects_path(gods):
    t = gods.V().has("name", "hercules").repeat_until(
        lambda x: x.out("father"),
        lambda x: F.col("age") >= 10000,
        max_times=5,
        emit=True,
    )
    names = sorted(r["name"] for r in t.values("name").collect())
    assert names == ["hercules", "jupiter", "saturn"]


def test_repeat_until_max_times_returns_active(gods):
    # brother edges cycle forever; max_times cap returns in-flight traversers
    t = gods.V().has("name", "jupiter").repeat_until(
        lambda x: x.out("brother"),
        lambda x: F.lit(False),
        max_times=3,
    )
    # 2 brothers each round, branching: 2 -> 4 -> 8 traversers after 3 hops
    assert t.count_value() == 8
