"""Gryo reader vs the GraphSON twins shipped beside every .kryo
fixture (titan-dist/src/assembly/static/data) — full-graph equality:
ids, labels, vertex properties (incl. multi-properties), out-edges
with edge properties, and crew's meta-properties."""

import json
import os

import pytest
from pyspark.sql import functions as F

DATA = "/root/reference/titan-dist/src/assembly/static/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference fixtures not present"
)


def _twin(name):
    with open(f"{DATA}/{name}.json") as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _norm_props(props):
    # graphson: {k: [{"id":.., "value":..}, ...]} -> {k: value | [values]}
    out = {}
    for k, vals in props.items():
        vs = [v["value"] for v in vals]
        out[k] = vs[0] if len(vs) == 1 else vs
    return out


@pytest.mark.parametrize(
    "name", ["tinkerpop-classic", "tinkerpop-modern", "tinkerpop-crew", "grateful-dead"]
)
def test_parse_matches_graphson_twin(name):
    from titan_spark.sources.gryo import parse_gryo_stream

    with open(f"{DATA}/{name}.kryo", "rb") as fh:
        got = {r["id"]: r for r in parse_gryo_stream(fh.read())}
    want = {r["id"]: r for r in _twin(name)}
    assert set(got) == set(want)
    for vid, w in want.items():
        g = got[vid]
        assert g["label"] == w["label"]
        gprops = {
            k: (vals[0][1] if len(vals) == 1 else [v for _, v in vals])
            for k, vals in g["props"].items()
        }
        wprops = _norm_props(w.get("properties", {}))
        assert gprops == pytest.approx(wprops) if any(
            isinstance(v, float) for v in wprops.values()
        ) else gprops == wprops
        # out-edges with properties
        gedges = {
            (lbl, eid, other): g["edge_props"].get(eid, {})
            for lbl, pairs in g["out_edges"].items()
            for eid, other in pairs
        }
        wedges = {
            (lbl, e["id"], e["inV"]): e.get("properties", {})
            for lbl, es in w.get("outE", {}).items()
            for e in es
        }
        assert set(gedges) == set(wedges)
        for k in wedges:
            assert gedges[k] == pytest.approx(wedges[k])


def test_crew_meta_properties():
    from titan_spark.sources.gryo import parse_gryo_stream

    with open(f"{DATA}/tinkerpop-crew.kryo", "rb") as fh:
        recs = {r["id"]: r for r in parse_gryo_stream(fh.read())}
    # graphson twin: marko's san diego location carries start/end times
    want = {}
    for r in _twin("tinkerpop-crew"):
        if r["id"] != 1:
            continue
        for v in r["properties"]["location"]:
            want[v["id"]] = v.get("properties", {})
    assert recs[1]["meta_props"] == want
    assert want  # crew really has meta-properties


def test_read_gryo_property_graph(spark):
    from titan_spark.sources.gryo import read_gryo

    g = read_gryo(
        spark,
        f"{DATA}/tinkerpop-modern.kryo",
        vertex_props={"name": "string", "age": "int"},
        edge_props={"weight": "double"},
    )
    assert g.vertices.count() == 6
    assert g.edges.count() == 6
    row = g.vertices.filter(F.col("name") == "marko").first()
    assert row["age"] == 29 and row["label"] == "person"
    knows = (
        g.edges.filter(F.col("label") == "knows")
        .orderBy("edge_id")
        .select("src", "dst", "weight")
        .collect()
    )
    assert [(r["src"], r["dst"], r["weight"]) for r in knows] == [
        (1, 2, 0.5),
        (1, 4, 1.0),
    ]
    # traversal over the loaded graph
    names = sorted(
        r["name"]
        for r in g.V().has("name", "marko").out("knows").values("name").collect()
    )
    assert names == ["josh", "vadas"]


def test_read_gryo_multi_properties_and_meta(spark):
    from titan_spark.sources.gryo import read_gryo

    g = read_gryo(
        spark,
        f"{DATA}/tinkerpop-crew.kryo",
        vertex_props={"name": "string", "location": "array<string>"},
        include_meta=True,
    )
    marko = g.vertices.filter(F.col("name") == "marko").first()
    assert marko["location"] == ["san diego", "santa cruz", "brussels", "santa fe"]
    meta = json.loads(marko["_meta"])
    assert meta["location:6"] == {"startTime": 1997, "endTime": 2001}


@pytest.mark.parametrize("name", ["tinkerpop-modern", "tinkerpop-crew"])
def test_encode_decode_roundtrip(name):
    from titan_spark.sources.gryo import encode_gryo_record, parse_gryo_stream

    with open(f"{DATA}/{name}.kryo", "rb") as fh:
        recs = list(parse_gryo_stream(fh.read()))
    blob = b"".join(encode_gryo_record(r) for r in recs)
    back = list(parse_gryo_stream(blob))
    assert back == recs


def test_write_read_gryo_roundtrip(spark, tmp_path):
    from titan_spark.sources.gryo import read_gryo, write_gryo

    g = read_gryo(
        spark,
        f"{DATA}/tinkerpop-modern.kryo",
        vertex_props={"name": "string", "age": "int"},
        edge_props={"weight": "double"},
    )
    out = str(tmp_path / "gryo_out")
    write_gryo(g, out, n_files=2)
    g2 = read_gryo(
        spark,
        out,
        vertex_props={"name": "string", "age": "int"},
        edge_props={"weight": "double"},
    )
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(g2.vertices) == key(g.vertices)
    assert key(g2.edges) == key(g.edges)
