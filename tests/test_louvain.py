"""Louvain community detection + Newman modularity."""

from pyspark.sql import functions as F

from titan_spark.compute import louvain, modularity
from titan_spark.graph import PropertyGraph


def _graph(spark, vids, pairs, weights=None):
    v = spark.createDataFrame([(i, "n") for i in vids], "id long, label string")
    rows = [
        (0, a, b, "x", float(weights[i]) if weights else 1.0)
        for i, (a, b) in enumerate(pairs)
    ]
    e = spark.createDataFrame(
        rows, "edge_id long, src long, dst long, label string, w double"
    )
    return PropertyGraph(v, e)


def _cliques(*groups):
    edges = []
    for cl in groups:
        edges += [(a, b) for i, a in enumerate(cl) for b in cl[i + 1 :]]
    return edges


def test_louvain_two_cliques(spark):
    A, B = [0, 2, 4, 6], [1, 3, 5, 7]
    g = _graph(spark, A + B, _cliques(A, B) + [(0, 1)])
    out = {r["id"]: r["community"] for r in louvain(g).collect()}
    assert {out[i] for i in A} == {0} and {out[i] for i in B} == {1}


def test_louvain_contracted_level_respects_negative_gain(spark):
    """Chain of 6-cliques bridged between min members: level 2 runs on
    the contracted supergraph where every supervertex's only proper
    edges cross communities — merging is negative-gain and must NOT
    happen (regression: missing stay-candidate forced pair merges)."""
    groups = [[n * 100 + i for i in range(6)] for n in range(5)]
    reps = [min(gr) for gr in groups]
    bridges = [(reps[i], reps[i + 1]) for i in range(4)]
    g = _graph(spark, [x for gr in groups for x in gr], _cliques(*groups) + bridges)
    out = {r["id"]: r["community"] for r in louvain(g, levels=2).collect()}
    assert len(set(out.values())) == 5
    for gr in groups:
        assert {out[i] for i in gr} == {min(gr)}


def test_louvain_weighted_edges_dominate(spark):
    """4-cycle with two heavy opposite edges: weighted Louvain pairs
    the heavy endpoints, ignoring the unit square edges."""
    g = _graph(
        spark,
        [0, 1, 2, 3],
        [(0, 1), (1, 2), (2, 3), (0, 3)],
        weights=[10.0, 1.0, 10.0, 1.0],
    )
    out = {r["id"]: r["community"] for r in louvain(g, weight_col="w").collect()}
    assert out[0] == out[1] and out[2] == out[3] and out[0] != out[2]


def test_modularity_closed_form(spark):
    """Two 4-cliques + bridge: Q(cliques) = 2*(6/13 - (13/26)^2) =
    0.423077; the all-in-one partition scores 0; a perfect split with
    no cut is higher than the bridged one."""
    A, B = [0, 1, 2, 3], [10, 11, 12, 13]
    g = _graph(spark, A + B, _cliques(A, B) + [(3, 10)])
    asg = spark.createDataFrame(
        [(i, 0) for i in A] + [(i, 1) for i in B], "id long, community long"
    )
    row = modularity(g, asg).collect()[0]
    assert row["n_communities"] == 2 and row["m_edges"] == 13.0
    assert abs(row["modularity"] - 0.423077) < 1e-6

    one = spark.createDataFrame([(i, 0) for i in A + B], "id long, community long")
    row1 = modularity(g, one).collect()[0]
    assert row1["modularity"] == 0.0

    # louvain's own output scores the same as the hand partition
    lv = louvain(g)
    row2 = modularity(g, lv).collect()[0]
    assert abs(row2["modularity"] - 0.423077) < 1e-6


def test_modularity_weighted(spark):
    """Weighted Q: heavy pair edges, unit cut edges on a 4-cycle.
    m = 22; pairs {0,1},{2,3}: e_c = 10, d_c = k(0)+k(1) = 11+11 = 22 →
    Q = 2*(10/22 - (22/44)^2) = 0.409091."""
    g = _graph(
        spark,
        [0, 1, 2, 3],
        [(0, 1), (1, 2), (2, 3), (0, 3)],
        weights=[10.0, 1.0, 10.0, 1.0],
    )
    asg = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, community long"
    )
    row = modularity(g, asg, weight_col="w").collect()[0]
    assert abs(row["modularity"] - (2 * (10 / 22 - (22 / 44) ** 2))) < 1e-5


def test_modularity_multigraph_sums_parallel_weights(spark):
    """Parallel edges (including both orientations of a directed pair)
    SUM their weights before Q — hand-computed: edges (0,1,w=3),
    (1,0,w=2), (2,3,w=1) collapse to und {(0,1):5, (2,3):1}, m=6;
    partition {0,1},{2,3}: Q = (5/6 - (10/12)^2) + (1/6 - (2/12)^2)
    = 0.277778. With the old max-collapse (w=3) the answer differs."""
    g = _graph(spark, [0, 1, 2, 3], [(0, 1), (1, 0), (2, 3)], weights=[3.0, 2.0, 1.0])
    asg = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, community long"
    )
    row = modularity(g, asg, weight_col="w").collect()[0]
    assert row["m_edges"] == 6.0
    assert abs(row["modularity"] - (5 / 6 - (10 / 12) ** 2 + 1 / 6 - (2 / 12) ** 2)) < 1e-6


def test_louvain_multigraph_parallel_weights(spark):
    """Parallel/bidirectional edge weights sum in louvain's input
    collapse too (consistent with the contraction step): heavy summed
    pairs {0,1} and {2,3} on a 4-cycle with unit cut edges."""
    g = _graph(
        spark,
        [0, 1, 2, 3],
        [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (0, 3)],
        weights=[5.0, 5.0, 1.0, 5.0, 5.0, 1.0],
    )
    out = {r["id"]: r["community"] for r in louvain(g, weight_col="w").collect()}
    assert out[0] == out[1] and out[2] == out[3] and out[0] != out[2]


def test_louvain_isolated_vertex_is_singleton(spark):
    """A vertex with no edges must still appear in the output as its
    own singleton community (regression: inner mapping join dropped
    isolated vertices)."""
    g = _graph(spark, [0, 1, 2, 99], _cliques([0, 1, 2]))
    out = {r["id"]: r["community"] for r in louvain(g).collect()}
    assert set(out) == {0, 1, 2, 99}
    assert out[99] == 99
    assert {out[i] for i in (0, 1, 2)} == {0}
