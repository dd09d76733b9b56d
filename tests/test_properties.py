"""Property-based tests (hypothesis): the Titan tokenizer contract and
predicate null conventions hold for arbitrary inputs, not just fixture
values. Spark evaluates batches (one job per example set)."""

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from titan_spark.functions.predicates import P
from titan_spark.functions.text import text_contains, tokenize

ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


def py_tokenize(s: str) -> list[str]:
    """The reference contract (Text.java:38-58): lowercase, split on
    non-alphanumeric, drop empties."""
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


@settings(max_examples=8, deadline=None)
@given(st.lists(ASCII, min_size=1, max_size=25))
def test_tokenizer_matches_reference_contract(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, s string")
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", tokenize(F.col("s")).alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_tokenize(t), repr(t)


@settings(max_examples=8, deadline=None)
@given(st.lists(ASCII, min_size=1, max_size=15), ASCII)
def test_text_contains_matches_reference_contract(spark, texts, query):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, s string")
    got = {
        r["i"]
        for r in df.filter(text_contains(F.col("s"), query)).select("i").collect()
    }
    qtoks = set(py_tokenize(query))
    expect = {
        i for i, t in enumerate(texts) if qtoks and qtoks.issubset(set(py_tokenize(t)))
    }
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=30),
    st.lists(st.integers(-50, 50), min_size=1, max_size=5),
)
def test_predicate_null_conventions(spark, values, members):
    """Titan semantics: eq(null)=absent, neq(null)=present,
    within drops nulls, without requires key present."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, v int")

    def ids(pred):
        return {r["i"] for r in df.filter(pred(F.col("v"))).select("i").collect()}

    assert ids(P.eq(None)) == {i for i, v in enumerate(values) if v is None}
    assert ids(P.neq(None)) == {i for i, v in enumerate(values) if v is not None}
    assert ids(P.within(members)) == {
        i for i, v in enumerate(values) if v is not None and v in members
    }
    assert ids(P.without(members)) == {
        i for i, v in enumerate(values) if v is not None and v not in members
    }
    lo, hi = min(members), max(members)
    assert ids(P.between(lo, hi)) == {
        i for i, v in enumerate(values) if v is not None and lo <= v < hi
    }
