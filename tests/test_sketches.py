"""Count-min sketch contracts (pipeline/sketches.py)."""

from pyspark.sql import functions as F

from titan_spark.functions.text import tokenize
from titan_spark.pipeline.sketches import cms_build, cms_estimate, cms_heavy_hitters


def _docs(spark):
    rows = [
        (1, "apple apple apple banana cherry"),
        (2, "apple banana banana durian elder"),
        (3, "apple cherry fig grape hazel iris"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cms_never_underestimates(spark):
    df = _docs(spark)
    terms = df.select(F.explode(tokenize(F.col("text"))).alias("term"))
    true = {r["term"]: r["n"] for r in terms.groupBy("term").agg(F.count("*").alias("n")).collect()}
    sk = cms_build(terms, "term")
    est = {r["term"]: r["est"] for r in cms_estimate(sk, terms.distinct(), "term").collect()}
    assert set(est) == set(true)
    for t, n in true.items():
        assert est[t] >= n  # CM is an overestimate, never under


def test_cms_heavy_hitters_finds_top_terms(spark):
    df = _docs(spark)
    top = cms_heavy_hitters(df, k=2).collect()
    assert top[0]["term"] == "apple" and top[0]["est"] >= 5
    assert top[1]["term"] == "banana" and top[1]["est"] >= 3


def test_cms_mergeable_across_partitions(spark):
    """Sketch of the union == elementwise sum of the partial sketches."""
    df = _docs(spark)
    t1 = df.filter("doc_id <= 2").select(F.explode(tokenize(F.col("text"))).alias("term"))
    t2 = df.filter("doc_id = 3").select(F.explode(tokenize(F.col("text"))).alias("term"))
    whole = {(r["row"], r["bucket"]): r["c"] for r in cms_build(
        df.select(F.explode(tokenize(F.col("text"))).alias("term")), "term").collect()}
    p1 = {(r["row"], r["bucket"]): r["c"] for r in cms_build(t1, "term").collect()}
    p2 = {(r["row"], r["bucket"]): r["c"] for r in cms_build(t2, "term").collect()}
    merged = dict(p1)
    for k, v in p2.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == whole
