"""Automatic path() — TinkerPop PathStep semantics without as_() tags
(ProcessStandardSuite per BerkeleyTitanProcessTest.java:12-15)."""

from pyspark.sql import functions as F


def _id_of(g, name):
    return g.V().has("name", name).df.select("id").first()[0]


def test_untagged_two_hop_path(gods):
    # g.V().has('name','hercules').out('father').out('father').path()
    rows = (
        gods.V().has("name", "hercules").out("father").out("father").path().collect()
    )
    assert len(rows) == 1
    h, j, s = _id_of(gods, "hercules"), _id_of(gods, "jupiter"), _id_of(gods, "saturn")
    assert list(rows[0]["path"]) == [h, j, s]


def test_out_records_one_element_per_hop(gods):
    # out() contributes only the arriving vertex; outE().inV() also
    # records the edge — both match Gremlin path semantics
    p1 = gods.V().has("name", "hercules").out("battled").path().collect()
    assert all(len(r["path"]) == 2 for r in p1) and len(p1) == 3
    p2 = gods.V().has("name", "hercules").outE("battled").inV().path().collect()
    assert all(len(r["path"]) == 3 for r in p2) and len(p2) == 3


def test_path_after_filter_steps(gods):
    # filters between hops replay transparently
    rows = (
        gods.V()
        .has("name", "hercules")
        .outE("battled")
        .has("time", 12)
        .inV()
        .path()
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["path"][0] == _id_of(gods, "hercules")
    assert rows[0]["path"][-1] == _id_of(gods, "cerberus")


def test_path_keeps_lazy_fold_plan(tpch):
    # the id-only tags must not force intermediate vertex-table joins:
    # a two-hop path over customer->orders->lineitem scans exactly the
    # two edge sources plus nothing else (same shape as the fold test)
    import contextlib
    import io

    df = tpch.V().has_label("customer").out("placed").out("contains").path()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "customer.parquet" not in plan
    assert "part.parquet" not in plan


def test_untagged_path_count_matches_hop_count(tpch):
    t = tpch.V().has_label("nation").out("in_region")
    assert t.path().count() == t.count_value()


def test_path_by_modulator(gods):
    rows = (
        gods.V().has("name", "hercules").out("father").path_by("name").collect()
    )
    assert len(rows) == 1
    assert rows[0]["path"] == ["hercules", "jupiter"]


def test_path_by_null_for_missing_key(gods):
    # 'age' is absent on location vertices: NULL in place, not an error
    rows = (
        gods.V().has("name", "hercules").out("battled").path_by("age").collect()
    )
    assert len(rows) == 3
    for r in rows:
        assert r["path"][0] == 30  # hercules' age leads every path
