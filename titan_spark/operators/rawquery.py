"""Raw index string queries with relevance scores (SURVEY §2.1 S8).

Reference: ``graph.indexQuery(idx, "v.name:(bob)")`` parses a
Lucene-ish query string, runs it against the external index, and
returns per-result scores with ``offset(n).limit(m)`` pagination
(``core/TitanIndexQuery.java:23-30``,
``graphdb/query/graph/IndexQueryBuilder.java:46-48,198-211``,
``diskstorage/indexing/RawQuery.java:60-73``). Element prefixes
``v.`` / ``e.`` select vertices or edges.

Supported syntax here (the subset Titan's own docs exercise,
``docs/directindex.txt`` — incl. the boolean prefixes and quoted
phrases the ES examples use):

    field:(term1 term2)      tokenized OR-match on field
    field:term               single term
    field:"a phrase"         consecutive-token phrase match
    field:[lo TO hi]         inclusive numeric range
    *:(terms) / *:"phrase"   ELEMENT WILDCARD — match against ANY of
                             the element's string property fields
                             ("v.*" / "e.*", docs/directindex.txt:44);
                             terms score over the union of all fields'
                             tokens (the element as one document),
                             phrases match per-field (no false
                             adjacency across field boundaries);
                             numeric ranges require a named field
    "field name":term        quoted field names (non-alphanumeric
                             property keys — the docs' "Property Key
                             Names" gotcha, v."first_name":john)
    clause AND clause        conjunction (also the bare default)
    NOT clause / -clause     negation (row must NOT match the clause)
    +clause                  required (the conjunctive default)

Scoring is deterministic (documented, reproducible — unlike a live
Lucene/ES backend whose scores depend on index segment statistics):

- ``scoring="fraction"`` (default, the oracle-checked mode): score =
  Σ over positive clauses of matched-term-fraction (1.0 for a matched
  phrase or range); negated clauses filter but never score.
- ``scoring="bm25"``: Okapi BM25 per positive terms-clause — IDF(t) =
  ln(1 + (N − df_t + 0.5)/(df_t + 0.5)) and the (k1, b) tf-saturation
  / length normalization Lucene itself uses, so rankings track what a
  user of the reference's ES/Lucene backend sees (RawQuery.java:60-73
  returns backend scores verbatim). Corpus statistics (N, avg doc
  length, per-term document frequency) come from ONE aggregate over
  the scanned field and ride the plan as literals — at any scale the
  stats pass is a single scan producing a handful of broadcast
  scalars, and the score itself stays whole-stage-codegen column
  algebra. Phrase/range clauses contribute 1.0 as in fraction mode.
  Still deterministic: same corpus → same scores.

Both orders results by (score desc, id asc) then offset/limit.
tests/test_rawquery_scan.py pins the rank agreement between the two
modes on the gods fixture (Spearman ≥ 0.9 on multi-term queries).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from titan_spark.functions.text import tokenize

_TOKEN = re.compile(
    r"(?P<connector>\bAND\b|\bNOT\b)"
    r"|(?P<req>[+-])?(?:(?P<field>\*|[A-Za-z_][A-Za-z0-9_]*)|\"(?P<qfield>[^\"]+)\"):"
    r"(?:\((?P<terms>[^)]*)\)"
    r"|\[(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\]"
    r'|"(?P<phrase>[^"]*)"'
    r"|(?P<term>\S+))"
)


def _toks(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def parse_raw_query(query: str) -> list[dict]:
    """Parse the query string into clause dicts (each carries a
    ``negated`` flag from a ``NOT`` connector or ``-`` prefix)."""
    prefix = None
    m = re.match(r"^\s*([vep])\.(.*)$", query, re.S)
    if m:
        prefix, query = m.group(1), m.group(2)
    clauses = []
    negate_next = False
    for cm in _TOKEN.finditer(query):
        if cm.group("connector") is not None:
            if cm.group("connector") == "NOT":
                negate_next = True
            continue  # AND is the default conjunction — a no-op token
        negated = negate_next or cm.group("req") == "-"
        negate_next = False
        # quoted field names carry non-alphanumeric characters
        # (docs/directindex.txt "Property Key Names" gotcha:
        # v."first_name":john)
        c = {
            "field": cm.group("field") or cm.group("qfield"),
            "negated": negated,
        }
        if cm.group("terms") is not None:
            clauses.append({**c, "kind": "terms", "terms": _toks(cm.group("terms"))})
        elif cm.group("lo") is not None:
            clauses.append(
                {**c, "kind": "range", "lo": float(cm.group("lo")), "hi": float(cm.group("hi"))}
            )
        elif cm.group("phrase") is not None:
            toks = _toks(cm.group("phrase"))
            if not toks:
                raise ValueError(f"empty phrase in raw query: {query!r}")
            clauses.append({**c, "kind": "phrase", "phrase": toks})
        else:
            clauses.append({**c, "kind": "terms", "terms": _toks(cm.group("term"))})
    if not clauses:
        raise ValueError(f"unparseable raw query: {query!r}")
    if all(c["negated"] for c in clauses):
        raise ValueError(f"raw query needs at least one positive clause: {query!r}")
    return [{"prefix": prefix}] + clauses


def _string_prop_cols(df: DataFrame, id_col: str) -> list[str]:
    """The element's string-typed property columns — the wildcard
    (``v.*`` / ``e.*``) target set ("query if any of the properties on
    the element match", docs/directindex.txt:44). The id and label
    columns are element identity, not indexed properties."""
    return [
        name
        for name, dtype in df.dtypes
        if dtype == "string" and name not in (id_col, "label", "src", "dst")
    ]


def _tokens_for(df: DataFrame, field: str, id_col: str):
    """Token array for a clause: a named field's tokens, or for the
    ``*`` wildcard the concatenation of every string property field's
    tokens (the element scored as one document)."""
    if field == "*":
        cols = _string_prop_cols(df, id_col)
        if not cols:
            raise ValueError("wildcard raw query: element has no string property fields")
        arrs = [
            F.coalesce(tokenize(F.col(c).cast("string")), F.array())
            for c in cols
        ]
        out = arrs[0]
        for a in arrs[1:]:
            out = F.concat(out, a)
        return out
    fld = F.col(field) if field in df.columns else F.lit(None)
    return tokenize(fld.cast("string"))


def _bm25_stats(df: DataFrame, toks, terms: list[str]) -> tuple[float, float, dict]:
    """One aggregate over the tokenized field → (N, avgdl, df per
    term). Driver-sized result (2 + len(terms) scalars) that rides the
    scoring expression as literals."""
    row = df.select(toks.alias("_toks")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size("_toks")).alias("avgdl"),
        *[
            F.sum(F.array_contains("_toks", t).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    ).collect()[0]
    dfs = {t: float(row[f"df_{i}"] or 0) for i, t in enumerate(terms)}
    return float(row["n"]), float(row["avgdl"] or 0.0) or 1.0, dfs


def raw_index_query(
    graph,
    query: str,
    limit: int | None = None,
    offset: int = 0,
    scoring: str = "fraction",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Run a raw query string → DataFrame(id, score), ordered by
    (score desc, id asc), paginated with offset/limit.

    ``v.``/``e.`` prefix selects the element table (default vertices;
    ``p.`` maps to the vertex_properties table when present).
    ``scoring``: "fraction" (oracle-checked default) or "bm25" (Lucene
    -practical ranking; see module docstring).
    """
    if scoring not in ("fraction", "bm25"):
        raise ValueError(f"scoring must be fraction|bm25, got {scoring!r}")
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
        neg = c.get("negated", False)
        if c["kind"] == "terms":
            toks = _tokens_for(df, c["field"], id_col)
            qterms = sorted(set(c["terms"]))
            qarr = F.array(*[F.lit(t) for t in qterms])
            matched = F.size(F.array_intersect(toks, qarr))
            # NULL field counts as "does not contain" — a negated
            # clause must MATCH rows whose field is absent
            hit = F.coalesce(matched > 0, F.lit(False))
            if neg:
                cond = cond & ~hit
            elif scoring == "bm25" and (c["field"] == "*" or c["field"] in df.columns):
                import math

                cond = cond & hit
                n_docs, avgdl, dfs = _bm25_stats(df, toks, qterms)
                dl = F.size(toks).cast("double")
                norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
                def _tf(term, _toks=toks):
                    # single-parameter lambda: a second (defaulted)
                    # param would make F.filter pass the array INDEX
                    return F.size(F.filter(_toks, lambda x: x == F.lit(term)))

                for t in qterms:
                    idf = math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
                    tf = _tf(t).cast("double")
                    score = score + F.lit(idf) * tf * (k1 + 1.0) / (tf + norm)
            else:
                cond = cond & hit
                score = score + matched.cast("double") / max(len(qterms), 1)
        elif c["kind"] == "phrase":
            needle = " " + " ".join(c["phrase"]) + " "
            if c["field"] == "*":
                # per-field OR: a phrase must sit inside ONE field —
                # concatenating fields would fabricate adjacency
                # between the last token of one and the first of the
                # next
                hit = F.lit(False)
                for fc in _string_prop_cols(df, id_col):
                    ftoks = tokenize(F.col(fc).cast("string"))
                    fpad = F.concat(F.lit(" "), F.array_join(ftoks, " "), F.lit(" "))
                    hit = hit | F.coalesce(fpad.contains(needle), F.lit(False))
            else:
                toks = tokenize(fld.cast("string"))
                padded = F.concat(F.lit(" "), F.array_join(toks, " "), F.lit(" "))
                hit = F.coalesce(padded.contains(needle), F.lit(False))
            if neg:
                cond = cond & ~hit
            else:
                cond = cond & hit
                score = score + F.when(hit, 1.0).otherwise(0.0)
        else:
            if c["field"] == "*":
                raise ValueError(
                    "numeric range clauses require a named field (the "
                    "*-wildcard targets string property fields)"
                )
            in_range = F.coalesce((fld >= c["lo"]) & (fld <= c["hi"]), F.lit(False))
            if neg:
                cond = cond & ~in_range
            else:
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
