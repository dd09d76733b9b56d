"""Motif matching — the Gremlin ``match()`` step (SURVEY §2.10 full
suite) as a declarative pattern over the graph.

Pattern syntax (GraphFrames-inspired, public-API shape):

    "(a)-[e:label]->(b); (b)-[e2]->(c); !(a)-[:label2]->(c)"

- named vertices bind columns ``a.id``, ``a.<prop>`` …
- named edges bind ``e.edge_id``, ``e.<prop>``; ``:label`` restricts
  the edge label; anonymous edges ``-[]->`` / ``-[:x]->`` bind nothing
- repeated *vertex* names unify (the same vertex must match); edge
  names must be distinct per clause, and self-loop clauses
  ``(a)->(a)`` are rejected (filter ``src == dst`` on an edge
  traversal for that)
- a ``!`` clause is a negated edge (anti-join): no such edge exists

Compilation: each positive clause is one edges scan (label-filtered)
joined on shared vertex names; vertex property columns come from one
vertices join per named vertex; negated clauses become left-anti
joins. Catalyst orders the joins; every join key is a vertex id.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CLAUSE = re.compile(
    r"^\s*(?P<neg>!)?\s*\((?P<src>\w*)\)\s*-\s*\[(?P<ename>\w*)"
    r"(?::(?P<label>\w+))?\]\s*->\s*\((?P<dst>\w*)\)\s*$"
)


def _parse(pattern: str) -> list[dict]:
    clauses = []
    anon = 0
    for part in pattern.split(";"):
        if not part.strip():
            continue
        m = _CLAUSE.match(part)
        if not m:
            raise ValueError(f"unparseable motif clause: {part.strip()!r}")
        d = m.groupdict()
        if not d["src"] or not d["dst"]:
            anon += 1
            d["src"] = d["src"] or f"__anon_src{anon}"
            d["dst"] = d["dst"] or f"__anon_dst{anon}"
        if d["neg"] and d["ename"]:
            raise ValueError("negated clauses cannot bind an edge name")
        if d["src"] == d["dst"]:
            raise ValueError(
                f"self-loop clause ({d['src']})->({d['dst']}) is not supported; "
                "filter src==dst on an edge traversal instead"
            )
        clauses.append(d)
    if not clauses or all(c["neg"] for c in clauses):
        raise ValueError("motif needs at least one positive clause")
    names = [c["ename"] for c in clauses if c["ename"]]
    if len(names) != len(set(names)):
        raise ValueError(
            "edge names must be distinct per clause (vertex names unify; "
            "edge unification is not supported)"
        )
    return clauses


def find_motif(graph, pattern: str) -> DataFrame:
    """Match the pattern; returns one row per binding with struct
    columns per named vertex/edge (GraphFrames ``find`` shape)."""
    clauses = _parse(pattern)
    e_all = graph.edges
    v_all = graph.vertices

    result: DataFrame | None = None
    bound_vertices: set[str] = set()

    def edge_scan(c, idx: int) -> DataFrame:
        e = e_all
        if c["label"]:
            e = e.filter(F.col("label") == c["label"])
        cols = [
            F.col("src").alias(f"{c['src']}__id"),
            F.col("dst").alias(f"{c['dst']}__id"),
        ]
        if c["ename"]:
            cols.append(F.struct(*[F.col(x) for x in e_all.columns]).alias(c["ename"]))
        return e.select(*cols)

    for i, c in enumerate(cl for cl in clauses if not cl["neg"]):
        scan = edge_scan(c, i)
        if result is None:
            result = scan
            bound_vertices.update([c["src"], c["dst"]])
            continue
        join_keys = [v for v in (c["src"], c["dst"]) if v in bound_vertices]
        if join_keys:
            on = [f"{v}__id" for v in join_keys]
            result = result.join(scan, on, "inner")
        else:
            result = result.crossJoin(scan)
        bound_vertices.update([c["src"], c["dst"]])

    for c in (cl for cl in clauses if cl["neg"]):
        missing = [v for v in (c["src"], c["dst"]) if v not in bound_vertices]
        if missing:
            raise ValueError(f"negated clause uses unbound vertices {missing}")
        scan = edge_scan(c, -1).select(f"{c['src']}__id", f"{c['dst']}__id")
        result = result.join(scan, [f"{c['src']}__id", f"{c['dst']}__id"], "left_anti")

    # attach vertex structs for named (non-anonymous) vertices
    out_cols = []
    for v in sorted(bound_vertices):
        if v.startswith("__anon"):
            continue
        vstruct = v_all.select(
            F.col("id").alias(f"{v}__id"),
            F.struct(*[F.col(x) for x in v_all.columns]).alias(v),
        )
        result = result.join(vstruct, f"{v}__id")
        out_cols.append(v)
    edge_names = [c["ename"] for c in clauses if c["ename"]]
    return result.select(*out_cols, *edge_names)
