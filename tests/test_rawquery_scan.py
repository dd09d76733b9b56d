"""Raw index queries (S8), OLAP writeback (S11), VertexScanJob (C6),
IVF ANN recall, LIST-cardinality values."""

import pandas as pd
from pyspark.sql import functions as F

from titan_spark.operators.rawquery import raw_index_query
from titan_spark.pipeline.similarity import cosine_topk, ivf_search


def test_raw_query_terms_and_score(gods):
    # OR-match terms with fractional scores
    df = raw_index_query(gods, "v.name:(hercules jupiter saturn)")
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert set(rows) == {1, 4, 6}
    assert all(abs(s - 1 / 3) < 1e-6 for s in rows.values())


def test_raw_query_range_and_pagination(gods):
    df = raw_index_query(gods, "v.age:[30 TO 5000]")
    assert {r["id"] for r in df.collect()} == {4, 5, 6, 7, 8}  # ages 30..5000
    page = raw_index_query(gods, "v.age:[30 TO 5000]", limit=2, offset=1)
    ids = [r["id"] for r in page.collect()]
    assert ids == [5, 6]  # score ties broken by id, offset 1


def test_raw_query_edge_prefix(gods):
    df = raw_index_query(gods, "e.reason:(loves)")
    assert df.count() == 2


def test_raw_query_not_and_minus_prefix(gods):
    import pytest

    # NOT connector and '-' prefix both exclude; negated clauses filter
    # but never score
    df = raw_index_query(gods, "v.name:(hercules jupiter saturn) NOT name:jupiter")
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert set(rows) == {1, 6} and all(abs(s - 1 / 3) < 1e-6 for s in rows.values())
    df2 = raw_index_query(gods, "v.name:(hercules jupiter saturn) -name:jupiter")
    assert {r["id"] for r in df2.collect()} == {1, 6}
    # negated range: only hercules (age 30) survives NOT [100 TO 99999]
    df3 = raw_index_query(gods, "v.name:(hercules jupiter saturn) NOT age:[100 TO 99999]")
    assert {r["id"] for r in df3.collect()} == {6}
    with pytest.raises(ValueError, match="positive clause"):
        raw_index_query(gods, "v.NOT name:jupiter")


def test_raw_query_and_connector_and_phrase(gods):
    # explicit AND == the bare conjunction default
    a = raw_index_query(gods, "v.name:hercules AND age:[20 TO 40]")
    b = raw_index_query(gods, "v.name:hercules age:[20 TO 40]")
    assert [r["id"] for r in a.collect()] == [r["id"] for r in b.collect()] == [6]
    # quoted phrase matches consecutive tokens only
    assert raw_index_query(gods, 'e.reason:"loves waves"').count() == 1
    assert raw_index_query(gods, 'e.reason:"waves loves"').count() == 0
    # phrase scores 1.0 per matched phrase clause
    [row] = raw_index_query(gods, 'e.reason:"loves waves"').collect()
    assert abs(row["score"] - 1.0) < 1e-9


def test_persist_vertex_properties(gods):
    from titan_spark.compute import degree_count

    deg = degree_count(gods, "out").withColumnRenamed("degree", "outdeg")
    g2 = gods.persist_vertex_properties(deg)
    rows = {r["name"]: r["outdeg"] for r in g2.vertices.select("name", "outdeg").collect()}
    assert rows["jupiter"] == 4 and rows["hercules"] == 5 and rows["sky"] == 0
    # writeback replaces an existing column on second persist
    g3 = g2.persist_vertex_properties(
        deg.withColumn("outdeg", F.col("outdeg") + 100)
    )
    rows3 = {r["name"]: r["outdeg"] for r in g3.vertices.select("name", "outdeg").collect()}
    assert rows3["jupiter"] == 104


def test_vertex_scan_with_adjacency(gods):
    # per-vertex battled-edge stats through the map-only scan job
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        has_edges = pdf["e_edge_id"].notna()
        return pd.DataFrame(
            {
                "id": [pdf["id"].iloc[0]],
                "n_battled": [int(has_edges.sum())],
                "max_time": [pdf["e_time"].max() if has_edges.any() else None],
            }
        )

    out = gods.vertex_scan(fn, "id long, n_battled int, max_time double", ("battled",), "out")
    rows = {r["id"]: (r["n_battled"], r["max_time"]) for r in out.collect()}
    assert rows[6] == (3, 12.0)  # hercules: 3 battles, latest time 12
    assert rows[4] == (0, None)  # jupiter battles nothing
    assert len(rows) == 12


def test_ivf_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    rest = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in cosine_topk(rest, q, k=10).collect()}
    approx_all_cells = {
        r["vec_id"] for r in ivf_search(rest, q, k=10, nprobe=16).collect()
    }
    # probing every cell must equal brute force (sanity of the machinery)
    assert approx_all_cells == exact
    # probing 4 of 16 cells keeps decent recall on random data
    approx = {r["vec_id"] for r in ivf_search(rest, q, k=10, nprobe=4).collect()}
    assert len(approx & exact) >= 2


def test_multi_card_values_fixture(spark):
    from titan_spark.graph import PropertyGraph
    from titan_spark.schema import Cardinality, GraphSchema

    v = spark.createDataFrame([(1, "n"), (2, "n")], "id long, label string")
    e = spark.createDataFrame([], "edge_id long, src long, dst long, label string")
    vp = spark.createDataFrame(
        [(1, "vals", 10, 1), (1, "vals", 20, 2), (2, "vals", 30, 3)],
        "vertex_id long, key string, value int, prop_id long",
    )
    s = GraphSchema()
    s.make_property_key("vals", "int", Cardinality.LIST)
    g = PropertyGraph(v, e, vp, s)
    got = sorted(r["vals"] for r in g.V().values("vals").collect())
    assert got == [10, 20, 30]
    got1 = sorted(r["vals"] for r in g.V().has_id(1).values("vals").collect())
    assert got1 == [10, 20]


def _text_graph(spark):
    from titan_spark.graph import PropertyGraph

    # uniform 4-token docs (plus one short doc outside the main query's
    # match set): equal lengths isolate the term-count / IDF / tf
    # effects, where fraction and BM25 rank concordantly — mixed
    # lengths add BM25's length normalization, which fraction scoring
    # cannot see (tested separately below)
    docs = [
        (1, "spark engine distributed query"),
        (2, "spark spark spark tuning"),
        (3, "distributed query planner cost"),
        (4, "lucene scoring relevance ranking"),
        (5, "query engine cluster nodes"),
        (6, "spark query relevance planner"),
        (7, "relevance alpha beta gamma"),
        (8, "planner alpha"),
    ]
    v = spark.createDataFrame(
        [(i, "doc", t) for i, t in docs], "id long, label string, text string"
    )
    e = spark.createDataFrame([], "edge_id long, src long, dst long, label string")
    return PropertyGraph(v, e)


def test_bm25_scoring_rank_agreement(spark):
    """Score calibration (RawQuery.java:60-73 returns live backend
    scores; IndexQueryBuilder.java:198-211): the bm25 mode must (a)
    match the same result set as the oracle-checked fraction mode,
    (b) agree with it on ranks (Spearman), and (c) show the IDF /
    length effects fraction scoring cannot express."""
    g = _text_graph(spark)
    q = "v.text:(spark query relevance)"
    frac = {r["id"]: r["score"] for r in raw_index_query(g, q).collect()}
    bm25 = {r["id"]: r["score"] for r in raw_index_query(g, q, scoring="bm25").collect()}
    # same deterministic match set (doc 8 matches no term)
    assert set(frac) == set(bm25) == {1, 2, 3, 4, 5, 6, 7}
    s = pd.DataFrame({"f": pd.Series(frac), "b": pd.Series(bm25)})
    # spearman = pearson over ranks (pandas' spearman needs scipy,
    # which this container lacks)
    rho = s["f"].rank().corr(s["b"].rank())
    # closed-form on this fixture: 0.816 (bm25 fully orders fraction's
    # 1/3-score tier, cross-tier order is concordant)
    assert rho >= 0.75, f"rank agreement too low: spearman={rho}"
    # tier concordance at equal doc length: whenever fraction strictly
    # prefers u over v, bm25 agrees
    for u in frac:
        for v in frac:
            if frac[u] > frac[v]:
                assert bm25[u] > bm25[v], (u, v)
    # full-match doc tops both rankings
    assert max(bm25, key=bm25.get) == 6 and max(frac, key=frac.get) == 6
    # IDF: the rare-term doc ('relevance', df=3) outranks the
    # common-term doc ('query', df=4) under bm25; fraction ties them
    assert bm25[7] > bm25[5] and frac[7] == frac[5]
    # length normalization (invisible to fraction): same single
    # 'planner' match, the 2-token doc beats the 4-token doc
    lb = {
        r["id"]: r["score"]
        for r in raw_index_query(g, "v.text:(planner)", scoring="bm25").collect()
    }
    lf = {r["id"]: r["score"] for r in raw_index_query(g, "v.text:(planner)").collect()}
    assert lb[8] > lb[3] and lf[8] == lf[3]


def test_bm25_tf_saturation(spark):
    """tf saturation: repeated terms help sublinearly — doc 2's three
    'spark's score less than 3x a single occurrence, and more than 1x."""
    g = _text_graph(spark)
    bm25 = {
        r["id"]: r["score"]
        for r in raw_index_query(g, "v.text:(spark)", scoring="bm25").collect()
    }
    single = bm25[1]  # one 'spark' in a 4-token doc
    triple = bm25[2]  # three 'spark's in a 4-token doc
    assert single < triple < 3 * single


def test_bm25_gods_fixture_agreement(gods):
    """On the reference's own fixture both modes agree on the match
    set, and bm25 prefers the shorter of two equal-match docs."""
    frac = {r["id"]: r["score"] for r in raw_index_query(gods, "e.reason:(loves waves fresh)").collect()}
    bm25 = {
        r["id"]: r["score"]
        for r in raw_index_query(gods, "e.reason:(loves waves fresh)", scoring="bm25").collect()
    }
    assert set(frac) == set(bm25) == {2, 5}
    assert frac[2] == frac[5]  # fraction ties the two 2-of-3 matches
    assert bm25[5] > bm25[2]  # 'loves waves' (2 tokens) > 3-token doc


def test_raw_query_element_wildcard(gods):
    """`v.*` / `e.*` match the query against ANY of the element's
    string property fields (docs/directindex.txt:44 — the ES wildcard
    form of graph.indexQuery)."""
    import pytest

    df = raw_index_query(gods, "v.*:(hercules jupiter saturn)")
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert set(rows) == {1, 4, 6}
    # scores agree with the field-named form here (name is the only
    # string property, so the union-of-fields document is identical)
    named = {
        r["id"]: r["score"]
        for r in raw_index_query(gods, "v.name:(hercules jupiter saturn)").collect()
    }
    assert rows == named
    # e.* finds terms in reason without naming the field
    assert raw_index_query(gods, "e.*:(loves)").count() == 2
    # wildcard phrase matches within ONE field (no cross-field
    # adjacency), and composes with named clauses
    assert raw_index_query(gods, 'e.*:"loves waves"').count() == 1
    assert raw_index_query(gods, 'e.*:"waves loves"').count() == 0
    # bm25 scoring works over the wildcard document
    bm = raw_index_query(gods, "v.*:(hercules)", scoring="bm25")
    assert [r["id"] for r in bm.collect()] == [6]
    # numeric ranges require a named field
    with pytest.raises(ValueError, match="named field"):
        raw_index_query(gods, "v.*:[30 TO 5000]")


def test_raw_query_quoted_field_names(spark):
    """Quoted field names carry non-alphanumeric property keys
    (docs/directindex.txt "Property Key Names":
    graph.indexQuery(idx, 'v."first_name":john'))."""
    from titan_spark.graph import PropertyGraph

    v = spark.createDataFrame(
        [(1, "person", "john"), (2, "person", "jane")],
        "id long, label string, first_name string",
    )
    e = spark.createDataFrame(
        [], "edge_id long, src long, dst long, label string"
    )
    g = PropertyGraph(v, e)
    out = raw_index_query(g, 'v."first_name":john')
    assert [r["id"] for r in out.collect()] == [1]
    # quoted field + quoted phrase coexist in one query string
    out2 = raw_index_query(g, 'v."first_name":"john" -"first_name":jane')
    assert [r["id"] for r in out2.collect()] == [1]
