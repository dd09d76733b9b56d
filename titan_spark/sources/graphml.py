"""GraphML reader (SURVEY §2.1 S9 — the reference's IO test fixture
format, ``titan-test/data/v10k.graphml.gz``).

GraphML is a single-document XML format, so parsing is inherently
driver-side (iterparse streaming keeps memory bounded); the resulting
vertices/edges become distributed DataFrames immediately. For bulk
interchange at scale prefer GraphSON-lines (``sources/graphson.py``,
fully distributed) or parquet graph stores.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

from pyspark.sql import SparkSession

from titan_spark.graph import PropertyGraph

_NS = "{http://graphml.graphdrawing.org/xmlns}"

_CASTS = {
    "int": int,
    "long": int,
    "float": float,
    "double": float,
    "boolean": lambda s: s.strip().lower() == "true",
    "string": str,
}


def read_graphml(spark: SparkSession, path: str) -> PropertyGraph:
    """Parse a .graphml or .graphml.gz file into a PropertyGraph.

    Property keys/types come from the file's <key> declarations;
    node/edge labels from the TinkerPop convention keys
    ``labelV``/``labelE`` when present.
    """
    opener = gzip.open if path.endswith(".gz") else open
    # key id -> (attr name, type, domain); domain is the <key for=...>
    # scope — node and edge declarations of the same attr.name may have
    # different types and must resolve per-domain
    keys: dict[str, tuple[str, str, str]] = {}
    vertices: list[dict] = []
    edges: list[dict] = []
    node_ids: dict[str, int] = {}

    with opener(path, "rb") as fh:
        current: dict | None = None
        kind = None
        for event, el in ET.iterparse(fh, events=("start", "end")):
            tag = el.tag.removeprefix(_NS)
            if event == "start":
                if tag == "key":
                    keys[el.get("id")] = (
                        el.get("attr.name", el.get("id")),
                        el.get("attr.type", "string"),
                        el.get("for", "all"),
                    )
                elif tag == "node":
                    current, kind = {"_id": el.get("id")}, "node"
                elif tag == "edge":
                    current, kind = {
                        "_src": el.get("source"),
                        "_dst": el.get("target"),
                        "_id": el.get("id"),
                    }, "edge"
            else:  # end
                if tag == "data" and current is not None:
                    name, typ, _dom = keys.get(
                        el.get("key"), (el.get("key"), "string", "all")
                    )
                    cast = _CASTS.get(typ, str)
                    current[name] = cast(el.text) if el.text is not None else None
                elif tag == "node":
                    vertices.append(current)
                    current = None
                elif tag == "edge":
                    edges.append(current)
                    current = None
                el.clear()

    for i, v in enumerate(vertices):
        node_ids[v["_id"]] = i + 1

    vprop_names = sorted({k for v in vertices for k in v if not k.startswith("_")} - {"labelV"})
    eprop_names = sorted({k for e in edges for k in e if not k.startswith("_")} - {"labelE"})

    v_rows = [
        tuple(
            [node_ids[v["_id"]], v.get("labelV", "vertex")] + [v.get(k) for k in vprop_names]
        )
        for v in vertices
    ]
    e_rows = [
        tuple(
            [i + 1, node_ids[e["_src"]], node_ids[e["_dst"]], e.get("labelE", "edge")]
            + [e.get(k) for k in eprop_names]
        )
        for i, e in enumerate(edges)
    ]

    def _spark_type(name: str, domain: str) -> str:
        # prefer the declaration scoped to this domain; fall back to an
        # unscoped/any declaration of the same attr name
        best = None
        for _kid, (aname, typ, dom) in keys.items():
            if aname != name:
                continue
            if dom == domain:
                best = typ
                break
            if best is None:
                best = typ
        return {
            "int": "int",
            "long": "long",
            "float": "float",
            "double": "double",
            "boolean": "boolean",
        }.get(best or "string", "string")

    v_schema = "id long, label string" + "".join(
        f", `{n}` {_spark_type(n, 'node')}" for n in vprop_names
    )
    e_schema = "edge_id long, src long, dst long, label string" + "".join(
        f", `{n}` {_spark_type(n, 'edge')}" for n in eprop_names
    )
    return PropertyGraph(
        spark.createDataFrame(v_rows, v_schema),
        spark.createDataFrame(e_rows, e_schema),
    )
