"""Round-11 measurement harness (guide §1): per-query noop-sink timing
plus ``explain("formatted")`` capture for the headline set.

Usage:
    python tools/profile_r11.py [--plans DIR] [--time] [query ...]

With no query args, runs every HEADLINE query from bench.py (same
overrides as the bench). ``--plans DIR`` writes ``DIR/<query>_before.txt``
(or ``_after.txt`` with ``--after``). ``--time`` additionally times each
query with the noop sink (isolates computation from the sink per guide
§1.4) and prints one JSON line at the end.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_dir = None
    suffix = "_before"
    do_time = False
    names = []
    it = iter(args)
    for a in it:
        if a == "--plans":
            plans_dir = next(it)
        elif a == "--after":
            suffix = "_after"
        elif a == "--time":
            do_time = True
        else:
            names.append(a)

    import bench
    from titan_spark.plans.catalog import QUERIES, q_minhash_lsh_pairs, q_pq_codes, q_skew_two_hop
    from titan_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("titan_spark_profile_r11")

    overrides = {
        "minhash_lsh_pairs": lambda sp, d: q_minhash_lsh_pairs(sp, d, hash_fn="xxhash64"),
        "skew_two_hop": lambda sp, d: q_skew_two_hop(sp, d, n=1_000_000),
        "pq_codes": lambda sp, d: q_pq_codes(sp, d, kernel="arrow"),
    }
    headline = names or [q for q in bench.HEADLINE]
    timings: dict[str, float] = {}
    for name in headline:
        fn = overrides.get(name, QUERIES[name])
        spark.sparkContext.setJobDescription(f"profile: {name}")
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)
        if do_time:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            sys.stderr.write(f"TIMED {name}: {timings[name]}s\n")
        spark.sparkContext.setJobDescription(None)
    if do_time:
        print(json.dumps({"sf_dir": sf_dir, "noop_seconds": timings,
                          "total": round(sum(timings.values()), 3)}), flush=True)


if __name__ == "__main__":
    main()
