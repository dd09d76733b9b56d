"""VertexQuery / MultiVertexQuery builder facade (SURVEY §3.2).

Reference API (``core/TitanVertexQuery.java``, ``core/
TitanMultiVertexQuery.java:26-47``, builder
``graphdb/query/vertex/BasicVertexCentricQueryBuilder.java:391-543``):

    v.query().labels("battled").direction(OUT)
     .interval("time", 1, 10).orderBy("time", desc).limit(10).edges()

This facade compiles the same builder calls onto the traversal engine:
labels/direction become the edge expansion, has/interval become
predicates, orderBy+limit become the per-origin top-k window. The
MultiQuery variant is the same plan seeded with many vertices — batched
by construction (one join), which is what Titan's ``query.batch``
de-N+1 machinery worked to achieve.

Sort-key note: Titan serves ordered adjacency off the label's sort-key
slice for free; here ordering is a window, and the *storage* analog is
``PropertyGraph.write``'s sortWithinPartitions(src, label) layout,
which gives parquet row-group locality for the same access pattern.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from titan_spark.functions.predicates import P, Pred  # noqa: F401  (re-export)

_NOTSET = object()


class VertexQueryBuilder:
    """Fluent builder; terminal calls: edges() / vertices() / count() /
    edge_count() / property_values(key)."""

    def __init__(self, graph, vertex_ids: list[int]):
        self.graph = graph
        self.vertex_ids = list(vertex_ids)
        self._labels: tuple[str, ...] = ()
        self._direction = "both"
        self._preds: list[tuple[str, Any]] = []
        self._order: tuple = ()
        self._limit: int | None = None

    # -- builder surface (mirrors BaseVertexQuery) --
    def labels(self, *labels: str) -> "VertexQueryBuilder":
        self._labels = labels
        return self

    def direction(self, d: str) -> "VertexQueryBuilder":
        if d.lower() not in ("in", "out", "both"):
            raise ValueError("direction must be IN/OUT/BOTH")
        self._direction = d.lower()
        return self

    def has(self, key: str, value: Any = _NOTSET) -> "VertexQueryBuilder":
        """``has(k)`` = key present (matches the traversal facade);
        ``has(k, v)`` = EQUAL; ``has(k, P.xx(...))`` = predicate."""
        self._preds.append((key, value))
        return self

    def interval(self, key: str, start: Any, end: Any) -> "VertexQueryBuilder":
        """Half-open [start, end) — BaseVertexQuery.java:130-139."""
        self._preds.append((key, P.between(start, end)))
        return self

    def adjacent(self, other_id: int) -> "VertexQueryBuilder":
        self._preds.append(("~adjacent", P.eq(other_id)))
        return self

    def order_by(self, key: str, desc: bool = False) -> "VertexQueryBuilder":
        self._order = self._order + ((key, "desc" if desc else "asc"),)
        return self

    def limit(self, n: int) -> "VertexQueryBuilder":
        self._limit = n
        return self

    # -- compilation --
    def _edge_traversal(self):
        t = self.graph.V(*self.vertex_ids)
        if self._direction == "out":
            t = t.outE(*self._labels)
        elif self._direction == "in":
            t = t.inE(*self._labels)
        else:
            t = t.bothE(*self._labels)
        for key, value in self._preds:
            if key == "~adjacent":
                pred: Pred = value
                t = t.filter_(pred(t.col("~adjacent")))
            elif value is _NOTSET:
                t = t.has(key)
            else:
                t = t.has(key, value)
        if self._order and self._limit is not None:
            # per-origin ordered limit — the sort-key slice read (O5)
            t = t.local_top_k(self._limit, *self._order, by="_origin")
        elif self._order:
            t = t.order_by(*self._order)
        elif self._limit is not None:
            t = t.local_top_k(self._limit, "edge_id", by="_origin")
        return t

    # -- terminals --
    def edges(self) -> DataFrame:
        """Edge rows with their seed vertex in ``_origin``."""
        return self._edge_traversal().df

    def vertices(self) -> DataFrame:
        """Adjacent vertices (otherV of the matching edges)."""
        return self._edge_traversal().otherV().df

    def count(self) -> int:
        return self._edge_traversal().count_value()

    def edge_count(self) -> int:
        return self.count()

    def counts_per_vertex(self) -> DataFrame:
        """MultiQuery result shape: per-seed-vertex matching-edge count."""
        from pyspark.sql import functions as F

        return (
            self._edge_traversal()
            .df.groupBy(F.col("_origin").alias("vertex_id"))
            .agg(F.count(F.lit(1)).alias("count"))
        )

    def property_values(self, key: str) -> DataFrame:
        return self._edge_traversal().values(key)


def vertex_query(graph, *vertex_ids: int) -> VertexQueryBuilder:
    """``v.query()`` / ``tx.multiQuery(vs)`` entry point — one builder
    for one or many seed vertices (the multi case is the same single
    join plan)."""
    if not vertex_ids:
        raise ValueError("vertex_query needs at least one vertex id")
    return VertexQueryBuilder(graph, list(vertex_ids))
