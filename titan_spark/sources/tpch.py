"""TPC-H-ish tables → property graph view (FIXTURES.md F5).

Maps the driver's parquet tables (region nation customer supplier part
orders lineitem) onto the universal ``vertices``/``edges`` shape with
disjoint id ranges per label. The mapping is pure column arithmetic —
no shuffle: each vertex/edge family is a projection of one base table,
and the union is label-disjoint so a ``label = 'x'`` filter prunes all
other branches at plan time (Catalyst pushes the filter into each
union child, folds it to FALSE, and drops the branch), meaning a
traversal touches only the parquet files it actually needs — the same
effect as Titan's per-label index selection.

Id scheme (SURVEY §1.4: opaque longs with disjoint tagged ranges, the
relational analog of Titan's bit-prefixed ids, IDManager.java:19-44):

    customer 1e11+custkey · supplier 2e11+suppkey · part 3e11+partkey
    orders   4e11+orderkey · nation  5e11+nationkey · region 6e11+regionkey
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from titan_spark.graph import PropertyGraph
from titan_spark.schema import GraphSchema, Multiplicity

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# vertex-id offsets per label
# vertex spacing 1e11 and edge spacing 1e13 keep the id families
# collision-free up to SF ~10^4 (orderkey < 1e11, lineitem edge ids
# orderkey*8 < 1e12) — 64-bit longs have room to spare
OFF = {
    "customer": 100_000_000_000,
    "supplier": 200_000_000_000,
    "part": 300_000_000_000,
    "order": 400_000_000_000,
    "nation": 500_000_000_000,
    "region": 600_000_000_000,
}
# edge-id offsets per relation family
EOFF = {
    "placed": 10_000_000_000_000,
    "contains": 20_000_000_000_000,
    "supplied_by": 30_000_000_000_000,
    "cust_nation": 40_000_000_000_000,
    "supp_nation": 50_000_000_000_000,
    "in_region": 60_000_000_000_000,
}


def normalize_events_ts(events: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a session-zone TIMESTAMP regardless of
    how the parquet TIMESTAMP(NANOS) column surfaced.

    Spark has no nanosecond timestamp type, and how it degrades depends
    on the reader path: under ``nanosAsLong`` the column reads as
    ``bigint`` (epoch nanos); newer readers surface it as
    ``timestamp_ntz`` (nanos truncated to µs). Either way the target is
    a µs TIMESTAMP — duckdb does the same ns→µs truncation, so oracle
    comparisons line up. The NTZ→TIMESTAMP cast is value-preserving
    because the engine pins the session zone to UTC (session.py).
    """
    dt = dict(events.dtypes).get("ts")
    if dt == "bigint":
        return events.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    if dt == "timestamp_ntz":
        return events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLE_NAMES}
    out["events"] = normalize_events_ts(out["events"])
    return out


def vid(label: str, key_col) -> F.Column:
    return (F.lit(OFF[label]) + key_col.cast("long")).alias("id")


def tpch_schema() -> GraphSchema:
    s = GraphSchema()
    s.make_edge_label(
        "placed", Multiplicity.MULTI, src_labels=("customer",), dst_labels=("order",)
    )
    s.make_edge_label(
        "contains",
        Multiplicity.MULTI,
        sort_key=("shipdate",),
        src_labels=("order",),
        dst_labels=("part",),
    )
    s.make_edge_label(
        "supplied_by", Multiplicity.MULTI, src_labels=("part",), dst_labels=("supplier",)
    )
    s.make_edge_label(
        "in_nation",
        Multiplicity.MANY2ONE,
        src_labels=("customer", "supplier"),
        dst_labels=("nation",),
    )
    s.make_edge_label(
        "in_region", Multiplicity.MANY2ONE, src_labels=("nation",), dst_labels=("region",)
    )
    for label in ("customer", "supplier", "part", "order", "nation", "region"):
        s.make_vertex_label(label)
    return s


GRAPH_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def load_tpch_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    # only the 7 graph tables — not events/documents/embeddings
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t = {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in GRAPH_TABLES}

    vertices = (
        t["customer"]
        .select(
            vid("customer", F.col("c_custkey")),
            F.lit("customer").alias("label"),
            F.col("c_custkey").cast("long").alias("key"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .unionByName(
            t["supplier"].select(
                vid("supplier", F.col("s_suppkey")),
                F.lit("supplier").alias("label"),
                F.col("s_suppkey").cast("long").alias("key"),
                F.col("s_name").alias("name"),
                F.col("s_acctbal").alias("acctbal"),
            ),
            allowMissingColumns=True,
        )
        .unionByName(
            t["part"].select(
                vid("part", F.col("p_partkey")),
                F.lit("part").alias("label"),
                F.col("p_partkey").cast("long").alias("key"),
                F.col("p_name").alias("name"),
                F.col("p_brand").alias("brand"),
                F.col("p_type").alias("type"),
                F.col("p_size").cast("int").alias("size"),
                F.col("p_retailprice").alias("retailprice"),
            ),
            allowMissingColumns=True,
        )
        .unionByName(
            t["orders"].select(
                vid("order", F.col("o_orderkey")),
                F.lit("order").alias("label"),
                F.col("o_orderkey").cast("long").alias("key"),
                F.col("o_orderstatus").alias("orderstatus"),
                F.col("o_totalprice").alias("totalprice"),
                F.col("o_orderdate").alias("orderdate"),
                F.col("o_orderpriority").alias("orderpriority"),
            ),
            allowMissingColumns=True,
        )
        .unionByName(
            t["nation"].select(
                vid("nation", F.col("n_nationkey")),
                F.lit("nation").alias("label"),
                F.col("n_nationkey").cast("long").alias("key"),
                F.col("n_name").alias("name"),
            ),
            allowMissingColumns=True,
        )
        .unionByName(
            t["region"].select(
                vid("region", F.col("r_regionkey")),
                F.lit("region").alias("label"),
                F.col("r_regionkey").cast("long").alias("key"),
                F.col("r_name").alias("name"),
            ),
            allowMissingColumns=True,
        )
    )

    li = t["lineitem"]
    # lineitem edge id: orderkey * 8 + linenumber (linenumber <= 7 in TPC-H)
    li_eid = (F.col("l_orderkey").cast("long") * 8 + F.col("l_linenumber")).cast("long")
    li_props = [
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
        F.col("l_shipdate").alias("shipdate"),
        F.col("l_linenumber").cast("int").alias("linenumber"),
    ]

    edges = (
        t["orders"]
        .select(
            (F.lit(EOFF["placed"]) + F.col("o_orderkey")).cast("long").alias("edge_id"),
            (F.lit(OFF["customer"]) + F.col("o_custkey")).cast("long").alias("src"),
            (F.lit(OFF["order"]) + F.col("o_orderkey")).cast("long").alias("dst"),
            F.lit("placed").alias("label"),
            F.lit("customer").alias("src_label"),
            F.lit("order").alias("dst_label"),
        )
        .unionByName(
            li.select(
                (F.lit(EOFF["contains"]) + li_eid).cast("long").alias("edge_id"),
                (F.lit(OFF["order"]) + F.col("l_orderkey")).cast("long").alias("src"),
                (F.lit(OFF["part"]) + F.col("l_partkey")).cast("long").alias("dst"),
                F.lit("contains").alias("label"),
                F.lit("order").alias("src_label"),
                F.lit("part").alias("dst_label"),
                *li_props,
            ),
            allowMissingColumns=True,
        )
        .unionByName(
            li.select(
                (F.lit(EOFF["supplied_by"]) + li_eid).cast("long").alias("edge_id"),
                (F.lit(OFF["part"]) + F.col("l_partkey")).cast("long").alias("src"),
                (F.lit(OFF["supplier"]) + F.col("l_suppkey")).cast("long").alias("dst"),
                F.lit("supplied_by").alias("label"),
                F.lit("part").alias("src_label"),
                F.lit("supplier").alias("dst_label"),
                F.col("l_quantity").alias("quantity"),
                F.col("l_extendedprice").alias("extendedprice"),
                F.col("l_shipdate").alias("shipdate"),
            ),
            allowMissingColumns=True,
        )
        .unionByName(
            t["customer"].select(
                (F.lit(EOFF["cust_nation"]) + F.col("c_custkey")).cast("long").alias("edge_id"),
                (F.lit(OFF["customer"]) + F.col("c_custkey")).cast("long").alias("src"),
                (F.lit(OFF["nation"]) + F.col("c_nationkey")).cast("long").alias("dst"),
                F.lit("in_nation").alias("label"),
                F.lit("customer").alias("src_label"),
                F.lit("nation").alias("dst_label"),
            ),
            allowMissingColumns=True,
        )
        .unionByName(
            t["supplier"].select(
                (F.lit(EOFF["supp_nation"]) + F.col("s_suppkey")).cast("long").alias("edge_id"),
                (F.lit(OFF["supplier"]) + F.col("s_suppkey")).cast("long").alias("src"),
                (F.lit(OFF["nation"]) + F.col("s_nationkey")).cast("long").alias("dst"),
                F.lit("in_nation").alias("label"),
                F.lit("supplier").alias("src_label"),
                F.lit("nation").alias("dst_label"),
            ),
            allowMissingColumns=True,
        )
        .unionByName(
            t["nation"].select(
                (F.lit(EOFF["in_region"]) + F.col("n_nationkey")).cast("long").alias("edge_id"),
                (F.lit(OFF["nation"]) + F.col("n_nationkey")).cast("long").alias("src"),
                (F.lit(OFF["region"]) + F.col("n_regionkey")).cast("long").alias("dst"),
                F.lit("in_region").alias("label"),
                F.lit("nation").alias("src_label"),
                F.lit("region").alias("dst_label"),
            ),
            allowMissingColumns=True,
        )
    )

    return PropertyGraph(vertices, edges, schema=tpch_schema())
