"""Gremlin stragglers (VERDICT r6 #8): timeLimit() and explain()
(ProcessStandardSuite membership, BerkeleyTitanProcessTest.java:12-15)."""

import pytest
from pyspark.sql import functions as F

from titan_spark.operators.traversal import TimeLimitExceeded


def test_explain_returns_plan_text(gods):
    t = gods.V().has_label("god").out("brother")
    plan = t.explain_()
    assert isinstance(plan, str) and "== Physical Plan ==" in plan
    # simple mode works too and differs (no per-node detail section)
    simple = t.explain_("simple")
    assert "== Physical Plan ==" in simple and len(simple) < len(plan)
    # explain does NOT execute: a frontier with a poisoned UDF would
    # throw on profile() but explain_ stays plan-only — approximate by
    # asserting no count happens (plan of limit(0) still prints)
    assert "== Physical Plan ==" in gods.V().limit(0).explain_()


def test_time_limit_row_budget(gods):
    # deterministic partial-result form: LIMIT n
    assert gods.V().time_limit(max_rows=5).count_value() == 5
    # generous time budget: identical result, no exception
    assert gods.V().time_limit(max_ms=60_000).count_value() == 12
    rows = gods.V().has_label("god").time_limit(max_ms=60_000).to_rows()
    assert len(rows) == 3


def test_time_limit_deadline_cancels(spark):
    """A 1 ms budget on a multi-second job cancels the job group and
    raises TimeLimitExceeded (not a bare Py4J error)."""
    from titan_spark.graph import PropertyGraph

    n = 3000
    v = spark.range(n).select("id", F.lit("node").alias("label"))
    e = (
        spark.range(n)
        .crossJoin(spark.range(200).withColumnRenamed("id", "j"))
        .select(
            (F.col("id") * 1000 + F.col("j")).alias("edge_id"),
            F.col("id").alias("src"),
            ((F.col("id") + F.col("j")) % n).alias("dst"),
            F.lit("e").alias("label"),
        )
    )
    g = PropertyGraph(v, e)
    slow = g.V().out("e").out("e")  # ~120M traversers at the second hop
    with pytest.raises(TimeLimitExceeded, match="time_limit"):
        slow.time_limit(max_ms=1).count_value()
    # the session stays healthy after the cancel
    assert spark.range(3).count() == 3
