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


class _KryoOutput:
    """Minimal Kryo 2.x encoder mirroring :class:`_KryoInput`'s grammar
    (id accounting included: outer object, edge-prop map, every inner
    map and string get reference ids in write order)."""

    def __init__(self):
        self.out = bytearray()
        self.string_ids: dict[str, int] = {}
        self.next_id = 0

    def _track(self, obj=None) -> int:
        i = self.next_id
        self.next_id += 1
        return i

    def varint(self, v: int) -> None:
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                return

    def zigzag(self, v: int) -> None:
        self.varint((v << 1) ^ (v >> 63) if v < 0 else v << 1)

    def string(self, s: str) -> None:
        if s in self.string_ids:
            self.varint(self.string_ids[s] + 2)
            return
        self.varint(1)
        self.string_ids[s] = self._track()
        data = s.encode("utf-8")
        if 1 < len(s) < 64 and all(b < 0x80 for b in data):
            self.out += data[:-1]
            self.out.append(data[-1] | 0x80)
        else:  # UTF8 length-prefixed mode (len+1, high bit on first byte)
            n = len(s) + 1
            first = 0x80 | (n & 0x3F)
            rest = n >> 6
            if rest:
                first |= 0x40
            self.out.append(first)
            while rest:
                b = rest & 0x7F
                rest >>= 7
                self.out.append(b | 0x80 if rest else b)
            self.out += data

    def class_and_object(self, v) -> None:
        if v is None:
            self.varint(0)
        elif isinstance(v, bool):
            self.varint(5)
            self.out.append(1 if v else 0)
        elif isinstance(v, int):
            # longs keep inter-op with Titan property ids; ints cover
            # the fixture ids — pick by range
            if -(2**31) <= v < 2**31:
                self.varint(2)
            else:
                self.varint(9)
            self.zigzag(v)
        elif isinstance(v, float):
            self.varint(10)
            self.out += struct.pack(">d", v)
        elif isinstance(v, str):
            self.varint(3)
            self.string(v)
        else:
            raise TypeError(f"unsupported Gryo value type {type(v)}")

    def prop_map(self, m: dict) -> None:
        self.varint(0x0D)
        self.varint(1)
        self._track()
        self.varint(len(m))
        for k, v in m.items():
            self.class_and_object(k)
            self.class_and_object(v)


def encode_gryo_record(rec: dict) -> bytes:
    """Inverse of :func:`parse_gryo_record` (semantic round-trip; value
    types may widen, e.g. float32 weights re-encode as doubles)."""
    w = _KryoOutput()
    w.varint(1)
    w._track()  # outer
    edge_props = rec.get("edge_props") or {}
    if edge_props:
        w.varint(_HASHMAP_CLASS)
        w._track()
        w.varint(len(edge_props))
        for eid, m in edge_props.items():
            w.class_and_object(eid)
            w.prop_map(m)
    else:
        w.varint(0)
    meta_props = rec.get("meta_props") or {}
    if meta_props:
        w.varint(1)
        w._track()
        w.varint(len(meta_props))
        for pid, m in meta_props.items():
            w.class_and_object(pid)
            w.prop_map(m)
    else:
        w.varint(0)
    w.class_and_object(rec["id"])
    w.string(rec["label"])
    for key in ("in_edges", "out_edges"):
        adj = rec.get(key) or {}
        if adj:
            w.varint(1)
            w.zigzag(len(adj))
            for lbl, pairs in adj.items():
                w.string(lbl)
                w.zigzag(len(pairs))
                for eid, other in pairs:
                    w.class_and_object(eid)
                    w.class_and_object(other)
        else:
            w.varint(0)
    props = rec.get("props") or {}
    if props:
        w.varint(1)
        w.zigzag(len(props))
        for key, vals in props.items():
            w.string(key)
            w.zigzag(len(vals))
            for pid, val in vals:
                w.class_and_object(pid)
                w.class_and_object(val)
    else:
        w.varint(0)
    return _HEADER + bytes(w.out) + _TRAILER


def write_gryo(graph: PropertyGraph, path: str, n_files: int | None = None) -> None:
    """Export a PropertyGraph as a directory of Gryo part files.

    Spark-first sink: vertices are hash-distributed over ``n_files``
    groups (default: the session's shuffle parallelism); each group
    re-nests its adjacency (both directions, so records round-trip
    like GryoWriter's ``writeVertices(BOTH)``) and an applyInPandas
    task encodes and writes its own part file — the driver never sees
    record bytes. Works on any task-writable filesystem; for object
    stores front it with a committer.
    """
    import os

    spark = graph.vertices.sparkSession
    if n_files is None:
        n_files = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    os.makedirs(path, exist_ok=True)

    vprops = [c for c in graph.vertices.columns if c not in ("id", "label")]
    eprops = [c for c in graph.edges.columns if c not in ("edge_id", "src", "dst", "label")]
    # adjacency and properties travel as to_json strings: pandas would
    # coerce nullable int columns to float64 (29 -> 29.0), while JSON
    # keeps the integer/double distinction end-to-end
    estruct = F.struct(
        F.col("edge_id"), F.col("label"), *[F.col(c) for c in eprops]
    )
    out_adj = graph.edges.groupBy(F.col("src").alias("id")).agg(
        F.to_json(
            F.collect_list(F.struct(F.col("dst").alias("other"), estruct.alias("e")))
        ).alias("_out")
    )
    in_adj = graph.edges.groupBy(F.col("dst").alias("id")).agg(
        F.to_json(
            F.collect_list(F.struct(F.col("src").alias("other"), estruct.alias("e")))
        ).alias("_in")
    )
    nested = (
        graph.vertices.select(
            "id",
            "label",
            F.to_json(F.struct(*[F.col(c) for c in vprops])).alias("_props"),
        )
        .join(out_adj, "id", "left")
        .join(in_adj, "id", "left")
        .withColumn("_g", F.pmod(F.hash("id"), F.lit(n_files)))
    )

    def write_group(key, pdf):
        import pandas as pd

        chunks = []
        for _, row in pdf.iterrows():
            pid = [0]

            def prop_vals(v):
                pid[0] += 1
                return [(pid[0] - 1, x) for x in v] if isinstance(v, list) else [
                    (pid[0] - 1, v)
                ]

            raw_props = json.loads(row["_props"]) if row["_props"] else {}
            props = {
                k: prop_vals(v) for k, v in raw_props.items() if v is not None
            }
            edge_props = {}

            def adj(col):
                out: dict = {}
                if row[col] is None:
                    return out
                for item in json.loads(row[col]):
                    e = item["e"]
                    pm = {k: e[k] for k in eprops if e.get(k) is not None}
                    if pm:
                        edge_props[e["edge_id"]] = pm
                    out.setdefault(e["label"], []).append(
                        (e["edge_id"], item["other"])
                    )
                return out

            in_e, out_e = adj("_in"), adj("_out")
            chunks.append(
                encode_gryo_record(
                    dict(
                        id=int(row["id"]),
                        label=row["label"],
                        in_edges=in_e,
                        out_edges=out_e,
                        props=props,
                        edge_props=edge_props,
                        meta_props={},
                    )
                )
            )
        fname = os.path.join(path, f"part-{int(key[0]):05d}.kryo")
        with open(fname, "wb") as fh:
            fh.write(b"".join(chunks))
        return pd.DataFrame({"file": [fname], "n": [len(chunks)]})

    nested.groupBy("_g").applyInPandas(write_group, "file string, n long").collect()
