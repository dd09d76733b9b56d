"""Generate a scaled-up dataset by replicating a driver SF with key offsets.

VERDICT r4 task #4 asks for a measured scale-up proof point: run the bench
suite at sf1 (10x sf0.1) on the same local[32] box and report per-query
time ratios. The driver only ships sf{0.001,0.01,0.1}, so this tool derives
sf1 from sf0.1 deterministically (no RNG):

- ``region``/``nation`` are fixed-size dimensions (TPC-H semantics): copied.
- Fact/entity tables are replicated REPLICAS times; every key and foreign
  key among the scaled tables is offset by ``replica * (max_key + 1)`` so
  referential integrity and per-replica join fan-outs are preserved exactly.
  Graph ids stay collision-free: the tpch id scheme has headroom to key
  ~1e11 (sources/tpch.py OFF docstring) and sf1 orderkeys top out at 1.5e6.
- ``documents.text``: replica r>0 suffixes every token with a replica
  letter. Within-replica near-dup structure (what MinHash/SimHash/Jaccard
  bucket on) is preserved exactly; cross-replica shingle sets become
  disjoint. Without this, every doc would have REPLICAS-1 exact clones and
  the near-dup pair count would grow quadratically in REPLICAS -- a
  benchmark artifact, not a scale measurement.
- ``embeddings.embedding``: replica r>0 flips the sign of a fixed
  pseudo-random half of the dimensions (deterministic per replica).
  Sign-flipping a fixed dim subset is an orthogonal transform, so all
  within-replica cosine/top-k structure is preserved exactly while
  cross-replica copies of the same vector decorrelate (expected cosine ~0).

Everything is column algebra over one pass per table; no shuffle except the
final write repartition on the two big tables.

Usage: python tools/make_scaled_sf.py [--src DIR] [--dst DIR] [--replicas N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from titan_spark.session import get_spark  # noqa: E402
from titan_spark.sources.tpch import load_tables  # noqa: E402

# key domains scaled per replica: table -> columns sharing that key domain
KEY_DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
}

SCALED_TABLES = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
DIM_TABLES = ("region", "nation")


def _replica_signs(replica: int, dim: int) -> list[float]:
    """Deterministic +-1 pattern per replica (orthogonal diagonal transform)."""
    if replica == 0:
        return [1.0] * dim
    # LCG-style hash; no RNG state, reproducible across runs
    return [
        1.0 if ((i * 2654435761 + replica * 40503) % 1000) < 500 else -1.0
        for i in range(dim)
    ]


def scale_table(name: str, df: DataFrame, replica: int, strides: dict[str, int], dim: int) -> DataFrame:
    out = df
    for domain, cols in KEY_DOMAINS.items():
        for tbl, col in cols:
            if tbl == name:
                out = out.withColumn(col, F.col(col) + F.lit(replica * strides[domain]))
    if name == "documents" and replica > 0:
        tag = chr(ord("a") + replica - 1)
        out = out.withColumn("text", F.regexp_replace("text", r"(\S+)", r"$1" + tag))
        out = out.withColumn("n_chars", F.length("text").cast("long"))
    if name == "embeddings" and replica > 0:
        signs = F.array(*[F.lit(s) for s in _replica_signs(replica, dim)])
        out = out.withColumn(
            "embedding",
            F.zip_with("embedding", signs, lambda x, s: (x * s).cast("float")),
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "sf1"))
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("make_scaled_sf")
    tables = load_tables(spark, args.src)

    strides = {}
    for domain, cols in KEY_DOMAINS.items():
        tbl, col = cols[0]
        strides[domain] = tables[tbl].agg(F.max(col)).first()[0] + 1

    dim = len(tables["embeddings"].select("embedding").first()[0])

    os.makedirs(args.dst, exist_ok=True)
    for name in DIM_TABLES:
        tables[name].write.mode("overwrite").parquet(f"{args.dst}/{name}.parquet")
    for name in SCALED_TABLES:
        parts = [
            scale_table(name, tables[name], r, strides, dim)
            for r in range(args.replicas)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        # big facts get enough files for 32-way parallel scans downstream
        n_files = 32 if name in ("lineitem", "events", "orders") else 8
        df.repartition(n_files).write.mode("overwrite").parquet(
            f"{args.dst}/{name}.parquet"
        )
        print(f"wrote {name} x{args.replicas}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
