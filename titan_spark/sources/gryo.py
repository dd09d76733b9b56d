"""Gryo (TinkerPop 3.0 Kryo binary) reader — the last S9 surface.

Reference: Gryo is registered beside GraphSON in
``graphdb/tinkerpop/TitanIoRegistry.java:14``; the distribution ships
``titan-dist/src/assembly/static/data/*.kryo`` fixtures written by
TinkerPop 3.0.2's ``GryoWriter.writeVertices`` (pom.xml:62).

Wire format (decoded from the public format, validated against the
``*.json`` GraphSON twins of every shipped fixture): a stream of
self-contained vertex records, each

    16-byte header  "gio" + 13 zero bytes
    payload         Kryo-serialized StarGraph (see grammar below)
    12-byte trailer 0f 01 01 09 3a 15 8a 11 70 9b 99 96

Payload grammar (Kryo 2.x primitives: little-endian 7-bit varints,
zigzag ints/longs, big-endian float/double, ASCII strings terminated
by a high-bit byte / UTF8 strings length-prefixed with the high bit
set, reference-tracked strings and maps back-referenced as
``varint id+2``):

    01                      outer reference marker
    <edgeProperties>        writeClassAndObject: class 128 (HashMap) +
                            varint size + size * (edgeId, {key: value})
                            — or varint 0 for null
    <metaProperties>        objectOrNull: 00 null | 01 + varint size +
                            size * (propId, {key: value})
    <vertex id>             classAndObject (int 2 / long 9 / string 3)
    <label>                 string
    <in edges> <out edges>  each: bool; if set: zigzag #labels, per
                            label a string + zigzag #edges + per edge
                            (edgeId, otherVertexId) classAndObject
    <vertex properties>     bool; if set: zigzag #keys, per key a
                            string + zigzag #values + per value
                            (propId, value) classAndObject

Spark-first: files are read with the distributed ``binaryFile``
source and parsed on executors inside ``mapInPandas`` (one Arrow
batch per file) — the driver never touches record bytes, so a
directory of .kryo part files scales like any other source. Property
columns are schema-driven like :func:`read_graphson`.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from titan_spark.graph import PropertyGraph

_HEADER = b"gio" + b"\x00" * 13
_TRAILER = bytes.fromhex("0f0101093a158a11709b9996")
_HASHMAP_CLASS = 128  # registered HashMap id 126 + Kryo's +2 offset


class _KryoInput:
    """Minimal Kryo 2.x input cursor over one record payload."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        # reference table: ids are assigned to the outer object, each
        # map and each string in write order; back-refs are id + 2
        self.refs: list[Any] = []

    def _u8(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def _take(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def varint(self) -> int:
        shift = 0
        out = 0
        while True:
            b = self._u8()
            out |= (b & 0x7F) << shift
            if not (b & 0x80):
                return out
            shift += 7

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def _raw_string(self) -> str | None:
        b0 = self.buf[self.pos]
        if b0 & 0x80:  # UTF8 length-prefixed mode
            n = self._u8() & 0x3F
            if b0 & 0x40:
                shift = 6
                while True:
                    b = self._u8()
                    n |= (b & 0x7F) << shift
                    if not (b & 0x80):
                        break
                    shift += 7
            if n == 0:
                return None
            if n == 1:
                return ""
            return self._take(n - 1).decode("utf-8")
        out = bytearray()  # ASCII mode: bytes until the high-bit byte
        while True:
            b = self._u8()
            if b & 0x80:
                out.append(b & 0x7F)
                return out.decode("ascii")
            out.append(b)

    def string(self) -> str | None:
        marker = self.varint()
        if marker == 0:
            return None
        if marker >= 2:
            return self.refs[marker - 2]
        s = self._raw_string()
        self.refs.append(s)
        return s

    def class_and_object(self) -> Any:
        cid = self.varint()
        if cid == 0:
            return None
        if cid == 2:  # int
            return self.zigzag()
        if cid == 3:  # String
            return self.string()
        if cid == 4:  # float
            return struct.unpack(">f", self._take(4))[0]
        if cid == 5:  # boolean
            return bool(self._u8())
        if cid == 6:  # byte
            return struct.unpack("b", self._take(1))[0]
        if cid == 8:  # short
            return struct.unpack(">h", self._take(2))[0]
        if cid == 9:  # long
            return self.zigzag()
        if cid == 10:  # double
            return struct.unpack(">d", self._take(8))[0]
        raise ValueError(f"unsupported Kryo class id {cid} at byte {self.pos}")

    def prop_map(self) -> dict:
        cid = self.varint()
        if cid != 0x0D:
            raise ValueError(f"expected map class 0x0d, got {cid} at {self.pos}")
        marker = self.varint()
        if marker >= 2:
            return self.refs[marker - 2]
        out: dict = {}
        self.refs.append(out)
        for _ in range(self.varint()):
            k = self.class_and_object()
            out[k] = self.class_and_object()
        return out


def parse_gryo_record(payload: bytes) -> dict:
    """One StarGraph record → plain dict (ids, label, adjacency,
    vertex/edge/meta properties)."""
    r = _KryoInput(payload)
    if r.varint() != 1:
        raise ValueError("record does not start with a new-object marker")
    r.refs.append("<star>")
    edge_props: dict = {}
    ecls = r.varint()
    if ecls == _HASHMAP_CLASS:
        r.refs.append(edge_props)
        for _ in range(r.varint()):
            k = r.class_and_object()
            edge_props[k] = r.prop_map()
    elif ecls != 0:  # 0 = null (sometimes a non-canonical 2-byte zero)
        raise ValueError(f"unexpected edge-properties class {ecls}")
    meta_props: dict = {}
    mmark = r.varint()
    if mmark == 1:
        r.refs.append(meta_props)
        for _ in range(r.varint()):
            k = r.class_and_object()
            meta_props[k] = r.prop_map()
    elif mmark != 0:
        raise ValueError(f"unexpected meta-properties marker {mmark}")
    vid = r.class_and_object()
    label = r.string()

    def adjacency() -> dict[str, list[tuple]]:
        out: dict[str, list[tuple]] = {}
        if r.varint():
            for _ in range(r.zigzag()):
                lbl = r.string()
                pairs = []
                for _ in range(r.zigzag()):
                    eid = r.class_and_object()
                    other = r.class_and_object()
                    pairs.append((eid, other))
                out[lbl] = pairs
        return out

    in_edges = adjacency()
    out_edges = adjacency()
    props: dict[str, list[tuple]] = {}
    if r.varint():
        for _ in range(r.zigzag()):
            key = r.string()
            vals = []
            for _ in range(r.zigzag()):
                pid = r.class_and_object()
                vals.append((pid, r.class_and_object()))
            props[key] = vals
    if r.pos != len(payload):
        raise ValueError(f"{len(payload) - r.pos} undecoded trailing bytes")
    return {
        "id": vid,
        "label": label,
        "in_edges": in_edges,
        "out_edges": out_edges,
        "props": props,
        "edge_props": edge_props,
        "meta_props": meta_props,
    }


def parse_gryo_stream(data: bytes) -> Iterator[dict]:
    """Split a Gryo byte stream into records and parse each."""
    for chunk in data.split(_HEADER):
        if not chunk:
            continue
        if not chunk.endswith(_TRAILER):
            raise ValueError("gryo record missing the vertex trailer")
        yield parse_gryo_record(chunk[: -len(_TRAILER)])


def read_gryo(
    spark: SparkSession,
    path: str,
    vertex_props: dict[str, str] | None = None,
    edge_props: dict[str, str] | None = None,
    include_meta: bool = False,
) -> PropertyGraph:
    """Load Gryo file(s) into a PropertyGraph (same schema contract as
    :func:`read_graphson`: ``vertex_props`` / ``edge_props`` map
    property name → Spark type; unlisted properties drop; multi-valued
    vertex properties need an ``array<...>`` type).

    Edges are emitted from each record's OUT adjacency only (every
    edge of a ``writeVertices`` dump appears in its source vertex's
    record), so no dedup shuffle is needed. ``include_meta=True`` adds
    a ``_meta`` JSON column of per-property metadata (TinkerPop
    meta-properties, e.g. crew's location start/end times).
    """
    vertex_props = vertex_props or {}
    edge_props = edge_props or {}

    raw_schema = (
        "kind string, id long, label string, src long, dst long, edge_id long, "
        "props string, meta string"
    )

    def parse_files(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_gryo_stream(bytes(content)):
                    vprops = {
                        k: (vals[0][1] if len(vals) == 1 else [v for _, v in vals])
                        for k, vals in rec["props"].items()
                    }
                    meta = None
                    if rec["meta_props"]:
                        pid_to_key = {
                            pid: k
                            for k, vals in rec["props"].items()
                            for pid, _ in vals
                        }
                        meta = json.dumps(
                            {
                                f"{pid_to_key.get(pid, pid)}:{pid}": m
                                for pid, m in rec["meta_props"].items()
                            }
                        )
                    rows.append(
                        (
                            "v",
                            rec["id"],
                            rec["label"],
                            None,
                            None,
                            None,
                            json.dumps(vprops),
                            meta,
                        )
                    )
                    for lbl, pairs in rec["out_edges"].items():
                        for eid, other in pairs:
                            rows.append(
                                (
                                    "e",
                                    None,
                                    lbl,
                                    rec["id"],
                                    other,
                                    eid,
                                    json.dumps(rec["edge_props"].get(eid, {})),
                                    None,
                                )
                            )
            yield pd.DataFrame(
                rows,
                columns=[
                    "kind",
                    "id",
                    "label",
                    "src",
                    "dst",
                    "edge_id",
                    "props",
                    "meta",
                ],
            )

    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(parse_files, schema=raw_schema)
        .cache()
    )

    vschema = ", ".join(f"`{k}` {t}" for k, t in vertex_props.items())
    vcols = [F.col("id"), F.col("label")]
    if vertex_props:
        vcols += [
            F.from_json("props", vschema).getField(k).alias(k) for k in vertex_props
        ]
    if include_meta:
        vcols.append(F.col("meta").alias("_meta"))
    vertices = raw.filter(F.col("kind") == "v").select(*vcols)

    eschema = ", ".join(f"`{k}` {t}" for k, t in edge_props.items())
    ecols = [F.col("edge_id"), F.col("src"), F.col("dst"), F.col("label")]
    if edge_props:
        ecols += [
            F.from_json("props", eschema).getField(k).alias(k) for k in edge_props
        ]
    edges = raw.filter(F.col("kind") == "e").select(*ecols)
    return PropertyGraph(vertices, edges)
