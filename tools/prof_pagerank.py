"""A/B: pagerank with contrib_e cached unpartitioned (current) vs
repartitioned by src before cache (per-round src Exchange reuse).

Usage: SPARK_GRAFT_SF_DIR=... python tools/prof_pagerank.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from titan_spark.compute.algorithms import pagerank
from titan_spark.plans.catalog import graph
from titan_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("prof_pagerank")
    g = graph(spark, sf_dir)
    g.num_vertices(), g.num_edges()  # warm the scans
    for r in range(reps):
        t0 = time.perf_counter()
        pagerank(g, alpha=0.85, iterations=3).count()
        print(f"rep{r}: {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
