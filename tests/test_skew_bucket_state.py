"""Salted aggregation, bucketed store (shuffle-free joins), stateful
streaming operator."""

from pyspark.sql import functions as F

from titan_spark.operators.skew import salted_agg, salted_join_broadcast_hot


def test_salted_agg_equals_plain(tpch):
    e = tpch.edges.filter(F.col("label") == "contains")
    plain = {
        (r["src"],): (r["degree"], r["q"])
        for r in e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"), F.sum("quantity").alias("q"))
        .collect()
    }
    salted = {
        (r["src"],): (r["degree"], r["q"])
        for r in salted_agg(
            e, ["src"], {"degree": ("count", None), "q": ("sum", "quantity")}, n_salts=8
        ).collect()
    }
    assert plain == salted


def test_salted_join_hot_keys(spark):
    big = spark.range(0, 10000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    out = salted_join_broadcast_hot(big, small, "k", hot_keys=[0, 1])
    plain = big.join(small, "k")
    assert out.count() == plain.count() == 10000
    assert out.agg(F.sum(F.col("v") * F.col("w"))).first()[0] == plain.agg(
        F.sum(F.col("v") * F.col("w"))
    ).first()[0]


def test_bucketed_store_joins_without_shuffle(spark, tpch, tmp_path):
    import contextlib
    import io

    from titan_spark.graph import PropertyGraph
    from titan_spark.sources.tpch import tpch_schema

    tpch.write_bucketed("g_test", n_buckets=8)
    g = PropertyGraph.read_bucketed(spark, "g_test", schema=tpch_schema())
    assert g.V().count_value() == tpch.V().count_value()

    # self-join of bucketed edges on src must not add a shuffle on the
    # bucketed side: with bucket scan, SortMergeJoin reads buckets
    e1 = g.edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        e1.explain("formatted")
    plan = buf.getvalue()
    # aggregation on the bucket key needs NO exchange before the agg
    assert "Exchange hashpartitioning(src" not in plan
    # and traversal answers agree with the unbucketed graph
    a = g.V().has_label("customer").out("placed").count_value()
    b = tpch.V().has_label("customer").out("placed").count_value()
    assert a == b


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    from titan_spark.streaming.stateful import running_user_totals
    from titan_spark.streaming.windows import read_events_stream

    ev = read_events_stream(spark, sf_dir)
    out = running_user_totals(ev)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # final state per user (last emitted row) must equal the batch totals
    got = spark.sql(
        """SELECT user_id, max(n_events) AS n, max(total_value) AS t
           FROM running_totals GROUP BY 1"""
    )
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("t"))
    )
    g = {r["user_id"]: (r["n"], r["t"]) for r in got.collect()}
    b = {r["user_id"]: (r["n"], r["t"]) for r in batch.collect()}
    assert g == b
