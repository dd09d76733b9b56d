"""Raw index string queries with relevance scores (SURVEY §2.1 S8).

Reference: ``graph.indexQuery(idx, "v.name:(bob)")`` parses a
Lucene-ish query string, runs it against the external index, and
returns per-result scores with ``offset(n).limit(m)`` pagination
(``core/TitanIndexQuery.java:23-30``,
``graphdb/query/graph/IndexQueryBuilder.java:46-48,198-211``,
``diskstorage/indexing/RawQuery.java:60-73``). Element prefixes
``v.`` / ``e.`` select vertices or edges.

Supported syntax here (the subset Titan's own docs exercise):

    field:(term1 term2)      tokenized OR-match on field
    field:term               single term
    field:[lo TO hi]         inclusive numeric range
    clause clause ...        conjunction of clauses

Scoring is deterministic (documented, reproducible — unlike
Lucene TF-IDF): score = Σ over clauses of matched-term-fraction.
Results order by (score desc, id asc) then offset/limit.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from titan_spark.functions.text import tokenize

_CLAUSE = re.compile(
    r"(?P<field>[A-Za-z_][A-Za-z0-9_]*):"
    r"(?:\((?P<terms>[^)]*)\)|\[(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\]|(?P<term>\S+))"
)


def parse_raw_query(query: str) -> list[dict]:
    """Parse the query string into clause dicts."""
    prefix = None
    m = re.match(r"^\s*([vep])\.(.*)$", query, re.S)
    if m:
        prefix, query = m.group(1), m.group(2)
    clauses = []
    for cm in _CLAUSE.finditer(query):
        if cm.group("terms") is not None:
            terms = [t for t in re.split(r"[^a-z0-9]+", cm.group("terms").lower()) if t]
            clauses.append({"field": cm.group("field"), "kind": "terms", "terms": terms})
        elif cm.group("lo") is not None:
            clauses.append(
                {
                    "field": cm.group("field"),
                    "kind": "range",
                    "lo": float(cm.group("lo")),
                    "hi": float(cm.group("hi")),
                }
            )
        else:
            terms = [t for t in re.split(r"[^a-z0-9]+", cm.group("term").lower()) if t]
            clauses.append({"field": cm.group("field"), "kind": "terms", "terms": terms})
    if not clauses:
        raise ValueError(f"unparseable raw query: {query!r}")
    return [{"prefix": prefix}] + clauses


def raw_index_query(
    graph,
    query: str,
    limit: int | None = None,
    offset: int = 0,
) -> DataFrame:
    """Run a raw query string → DataFrame(id, score), ordered by
    (score desc, id asc), paginated with offset/limit.

    ``v.``/``e.`` prefix selects the element table (default vertices;
    ``p.`` maps to the vertex_properties table when present).
    """
    parsed = parse_raw_query(query)
    prefix = parsed[0]["prefix"] or "v"
    clauses = parsed[1:]
    if prefix == "v":
        df, id_col = graph.vertices, "id"
    elif prefix == "e":
        df, id_col = graph.edges, "edge_id"
    else:
        if graph.vertex_properties is None:
            raise ValueError("p. query requires a vertex_properties table")
        df, id_col = graph.vertex_properties, "prop_id"

    score = F.lit(0.0)
    cond = F.lit(True)
    for c in clauses:
        fld = F.col(c["field"]) if c["field"] in df.columns else F.lit(None)
        if c["kind"] == "terms":
            toks = tokenize(fld.cast("string"))
            qarr = F.array(*[F.lit(t) for t in sorted(set(c["terms"]))])
            matched = F.size(F.array_intersect(toks, qarr))
            clause_score = matched.cast("double") / max(len(set(c["terms"])), 1)
            cond = cond & (matched > 0)
            score = score + clause_score
        else:
            in_range = (fld >= c["lo"]) & (fld <= c["hi"])
            cond = cond & in_range
            score = score + F.when(in_range, 1.0).otherwise(0.0)
    out = (
        df.filter(cond)
        .select(F.col(id_col).alias("id"), F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
    )
    if offset:
        # offset() plans as a GlobalLimit over per-partition partials —
        # no single-partition window shuffle (survives 100× the rows)
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out
