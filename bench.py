"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline set tracks BASELINE.md's workload shapes:
bulk element creation → graph build+count; indexed point lookups →
point_lookup; deep traversals → two_hop_revenue/three_hop_region;
full-scan OLAP → agg_pricing_summary/degree_part/topk_per_vertex;
plus the pipeline ops (text stats, LSH near-dup, cosine top-k).

Noise control (VERDICT r3 #5): the r3 report showed an across-the-board
~1.2-1.3× drift on untouched code paths — environment/JVM-load shift,
not plan regressions. To make environment drift separable from code
drift, the default mode runs the whole suite TWICE, each in a fresh JVM
(a subprocess with ``--single``), and reports per-query min-of-2 plus
both raw totals under ``runs`` so a reviewer can see the noise band.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "point_lookup",
    "batch_point_lookups",
    "scan_filter_order_limit",
    "hop_order_count",
    "two_hop_revenue",
    "three_hop_region",
    "semi_join_exists",
    "topk_per_vertex",
    "degree_part",
    "both_degree_nation",
    "agg_pricing_summary",
    "events_hourly",
    "text_contains",
    "token_stats",
    "doc_quality",
    "tfidf_top_terms",
    "hash_sample",
    "minhash_lsh_pairs",
    "cosine_topk",
    # iterative / bucketed paths (regressions here are scale regressions)
    "shortest_distance",
    "dedup_clusters",
    "repeat_emit_bfs",
    "embed_topk_pairs",
    # curation ops (round 3): repetition filters, decontamination,
    # semantic dedup — broadcast/bucketed plans, watch for scale creep
    "repetition_stats",
    "ngram_decontaminate",
    "semantic_dedup",
    # round 4: regex scrubbing + training-layout passes + clustering
    "pii_redact",
    "chunk_docs",
    "pack_windows",
    "kmeans_cells",
    "quantize_embeddings",
    "label_propagation",
    "weighted_distance",
    # round 5: supernode hop skew (AQE split proof at bench scale)
    "skew_two_hop",
]


def run_suite() -> dict:
    from titan_spark.plans.catalog import QUERIES, graph, q_minhash_lsh_pairs
    from titan_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None
    spark = get_spark("titan_spark_bench")

    # bench times the production hash (xxhash64); the driver's
    # correctness gate runs the catalog default (portable, oracle-green)
    from titan_spark.plans.catalog import q_skew_two_hop

    overrides = {
        "minhash_lsh_pairs": lambda sp, d: q_minhash_lsh_pairs(sp, d, hash_fn="xxhash64"),
        # bench the supernode hop at 10× the oracle fixture size
        "skew_two_hop": lambda sp, d: q_skew_two_hop(sp, d, n=1_000_000),
    }

    timings: dict[str, float] = {}

    # bulk-load shape: build the graph view and materialize counts
    t0 = time.perf_counter()
    g = graph(spark, sf_dir)
    nv = g.num_vertices()
    ne = g.num_edges()
    timings["graph_build_count"] = round(time.perf_counter() - t0, 3)

    for name in HEADLINE:
        fn = overrides.get(name, QUERIES[name])
        runs = []
        for _ in range(3):  # median of 3: robust to load spikes either way
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            _ = df.count()  # full materialization of the result
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 3)

    # OLAP full-scan shape (BASELINE: 200k-vertex/2M-edge scan workload,
    # TitanGraphIterativeBenchmark.java:77): PageRank over the WHOLE graph
    from titan_spark.compute import pagerank

    t0 = time.perf_counter()
    pr = pagerank(g, alpha=0.85, iterations=3)
    _ = pr.count()
    timings["pagerank_full_graph"] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
        "n_vertices": nv,
        "n_edges": ne,
    }


def main() -> None:
    if "--single" in sys.argv:
        print(json.dumps(run_suite()))
        return

    # two fresh JVMs; per-query min-of-2 separates env drift from code drift
    results = []
    for _ in range(2):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single"],
            capture_output=True,
            text=True,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            results.append(json.loads(line))
        except (json.JSONDecodeError, IndexError):
            sys.stderr.write(proc.stdout + proc.stderr)
    if not results:
        raise SystemExit("bench: no successful runs")

    merged = dict(results[0])
    queries = {
        q: min(r["queries"][q] for r in results if q in r["queries"])
        for q in results[0]["queries"]
    }
    merged["queries"] = queries
    merged["value"] = round(sum(queries.values()), 3)
    merged["runs"] = [r["value"] for r in results]  # raw totals, noise band
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
