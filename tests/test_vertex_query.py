"""Vertex-centric query builder against the reference's F2 fixture.

Mini version of ``TitanGraphTest.java:2522-2560 testVertexCentricQuery``
(FIXTURES.md F2): 2 hubs (v=1, u=2) + N spokes; for every spoke i
(1..N) and each hub, one OUT and one IN edge whose label cycles by
i % 3 — ``connect|friend|knows`` for v, ``connectDesc|friendDesc|knows``
for u. Edge props: time=i, weight=(i%4)+0.5, name='e'+i, number=i%5.

Reference assertions (scaled from N=9999 to N=99):
per-hub per-label degree = N/3 OUT + N/3 IN; ``interval(time,3,31)``
per direction per label → 10 (TitanGraphTest.java:2615-2673);
``has(weight, IN(0.5,1.5))`` on friend → half the friend edges.
"""

import pytest
from pyspark.sql import functions as F

from titan_spark.functions.predicates import P
from titan_spark.graph import PropertyGraph
from titan_spark.operators.vertexquery import vertex_query

N = 99
V_HUB, U_HUB = 1, 2


@pytest.fixture(scope="module")
def vcq(spark):
    vertices = [(V_HUB, "vertex", "v"), (U_HUB, "vertex", "u")] + [
        (10 + i, "vertex", f"v{i}") for i in range(1, N + 1)
    ]
    v_labels = ["connect", "friend", "knows"]
    u_labels = ["connectDesc", "friendDesc", "knows"]
    edges = []
    eid = 0
    for i in range(1, N + 1):
        spoke = 10 + i
        t, w, nm, num = i, (i % 4) + 0.5, f"e{i}", i % 5
        for hub, lbl in ((V_HUB, v_labels[i % 3]), (U_HUB, u_labels[i % 3])):
            eid += 1
            edges.append((eid, hub, spoke, lbl, t, w, nm, num))  # OUT
            eid += 1
            edges.append((eid, spoke, hub, lbl, t, w, nm, num))  # IN
    v = spark.createDataFrame(vertices, "id long, label string, name string")
    e = spark.createDataFrame(
        edges,
        "edge_id long, src long, dst long, label string, "
        "time int, weight double, name string, number int",
    )
    return PropertyGraph(v, e)


def test_per_label_degree(vcq):
    # per-hub per-label: N/3 OUT + N/3 IN edges
    for lbl in ("connect", "friend", "knows"):
        q = vertex_query(vcq, V_HUB).labels(lbl)
        assert q.direction("out").count() == N // 3
        assert vertex_query(vcq, V_HUB).labels(lbl).direction("in").count() == N // 3
        assert vertex_query(vcq, V_HUB).labels(lbl).direction("both").count() == 2 * (N // 3)


def test_interval_counts(vcq):
    # interval(time, 3, 31) half-open: times {3..30} ∩ {i : i%3==label_idx}
    # connect label = times with i%3==0 -> {3,6,...,30} = 10 (matches the
    # reference's per-direction count of 10, TitanGraphTest.java:2615+)
    q = vertex_query(vcq, V_HUB).labels("connect").direction("out").interval("time", 3, 31)
    assert q.count() == 10


def test_weight_in_list(vcq):
    # friend edges: i%3==1 -> i in {1,4,7,...}; weight=(i%4)+0.5
    # IN (0.5, 1.5) selects i%4 in {0,1}
    expect = len([i for i in range(1, N + 1) if i % 3 == 1 and (i % 4) in (0, 1)])
    q = (
        vertex_query(vcq, V_HUB)
        .labels("friend")
        .direction("out")
        .has("weight", P.within(0.5, 1.5))
    )
    assert q.count() == expect


def test_order_and_limit_per_vertex(vcq):
    # 10 most recent connect edges by time desc (sort-key order, O5)
    df = (
        vertex_query(vcq, V_HUB)
        .labels("connect")
        .direction("out")
        .order_by("time", desc=True)
        .limit(10)
        .edges()
    )
    times = [r["time"] for r in df.orderBy(F.desc("time")).collect()]
    expect = sorted((i for i in range(1, N + 1) if i % 3 == 0), reverse=True)[:10]
    assert times == expect


def test_multi_vertex_query_batched(vcq):
    # MultiQuery: both hubs in ONE plan; per-vertex counts
    out = vertex_query(vcq, V_HUB, U_HUB).labels("knows").direction("out").counts_per_vertex()
    rows = {r["vertex_id"]: r["count"] for r in out.collect()}
    assert rows == {V_HUB: N // 3, U_HUB: N // 3}


def test_adjacent_constraint(vcq):
    # edges between v and spoke 11 (i=1): label friend (1%3==1), 1 OUT
    q = vertex_query(vcq, V_HUB).direction("out").adjacent(11)
    assert q.count() == 1
    df = q.edges()
    assert df.collect()[0]["label"] == "friend"


def test_vertices_terminal(vcq):
    vs = (
        vertex_query(vcq, V_HUB)
        .labels("connect")
        .direction("out")
        .interval("time", 3, 10)
        .vertices()
    )
    names = sorted(r["name"] for r in vs.collect())
    assert names == ["v3", "v6", "v9"]
