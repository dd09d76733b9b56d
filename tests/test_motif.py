"""Motif matching (Gremlin match() analog)."""

import pytest

from titan_spark.operators.motif import find_motif


def test_two_hop_motif(gods):
    df = find_motif(gods, "(a)-[:father]->(b); (b)-[:father]->(c)")
    rows = [(r["a"]["name"], r["b"]["name"], r["c"]["name"]) for r in df.collect()]
    assert rows == [("hercules", "jupiter", "saturn")]


def test_motif_with_edge_binding(gods):
    df = find_motif(gods, "(h)-[e:battled]->(m)")
    rows = sorted((r["h"]["name"], r["m"]["name"], r["e"]["time"]) for r in df.collect())
    assert rows == [
        ("hercules", "cerberus", 12),
        ("hercules", "hydra", 2),
        ("hercules", "nemean", 1),
    ]


def test_triangle_motif(gods):
    # directed brother triangle: a->b, b->c, c->a among the gods
    df = find_motif(gods, "(a)-[:brother]->(b); (b)-[:brother]->(c); (c)-[:brother]->(a)")
    # jupiter/neptune/pluto each appear as 'a' in 2 directed 3-cycles
    assert df.count() == 6


def test_negated_clause(gods):
    # who battled something but does NOT live anywhere
    df = find_motif(gods, "(a)-[:battled]->(m); !(a)-[:lives]->(m)")
    assert df.count() == 3  # hercules battled 3, lives nowhere he battled
    # negation that removes rows: brothers where the destination does
    # NOT also point back (none - all brother edges are reciprocal)
    df2 = find_motif(gods, "(a)-[:brother]->(b); !(b)-[:brother]->(a)")
    assert df2.count() == 0


def test_negated_unbound_raises(gods):
    with pytest.raises(ValueError, match="unbound"):
        find_motif(gods, "(a)-[:pet]->(m); !(m)-[:lives]->(zzz)")


def test_unparseable_raises(gods):
    with pytest.raises(ValueError, match="unparseable"):
        find_motif(gods, "(a)->(b)")


def test_anonymous_vertex(gods):
    # demigods with any outgoing edge to something with age > 100
    df = find_motif(gods, "(a)-[:father]->(b); (b)-[:lives]->()")
    rows = [(r["a"]["name"], r["b"]["name"]) for r in df.collect()]
    assert rows == [("hercules", "jupiter")]
