"""Sampling error bound for source-sampled betweenness (Brandes–Pich
2007): on a fixed 200-vertex ring+chord graph, the population-scaled
estimate (n/k)·Σ_s δ(v,s) converges to exact Brandes betweenness
(k = n) as k grows, and every observed error sits far inside the
Hoeffding bound ε_k·n(n−1) with ε_k = sqrt(ln(2n/δ)/(2k)) that
auto_num_sources inverts.
"""

import math

import pytest

N = 200


@pytest.fixture(scope="module")
def ring_chord(spark):
    from titan_spark.graph import PropertyGraph

    verts = [(i, "n") for i in range(N)]
    edges, eid = [], 0
    for i in range(N):
        edges.append((eid, i, (i + 1) % N, "e"))
        eid += 1
        edges.append((eid, i, (i * 7 + 3) % N, "e"))
        eid += 1
    return PropertyGraph(
        spark.createDataFrame(verts, ["id", "label"]),
        spark.createDataFrame(edges, ["edge_id", "src", "dst", "label"]),
    )


def _bc(graph, sources):
    from titan_spark.compute import betweenness_centrality

    return {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(graph, sources, max_iterations=40).collect()
    }


def test_sampled_betweenness_error_shrinks_within_bound(ring_chord):
    exact = _bc(ring_chord, list(range(N)))
    max_err = {}
    for k in (4, 8, 16):
        srcs = [int(i * N / k) for i in range(k)]
        samp = _bc(ring_chord, srcs)
        errs = [abs(N / k * samp[v] - exact[v]) for v in exact]
        max_err[k] = max(errs)
        # Hoeffding + union bound at per-vertex failure prob δ=0.1:
        # every observed error must sit inside ε_k·n(n−1)
        eps_k = math.sqrt(math.log(2 * N / 0.1) / (2 * k))
        assert max_err[k] <= eps_k * N * (N - 1)
    # empirical convergence on this deterministic fixture (measured
    # 2067 → 1345 → 857; slack for float jitter only)
    assert max_err[16] < max_err[8] < max_err[4]
    assert max_err[16] <= 0.55 * max_err[4]
    assert max_err[16] <= 1100.0


def test_auto_num_sources_heuristic():
    from titan_spark.compute import auto_num_sources

    # closed form: ceil(ln(2n/δ) / (2ε²)), capped at n
    assert auto_num_sources(10**6, eps=0.1, delta=0.1) == math.ceil(
        math.log(2 * 10**6 / 0.1) / 0.02
    )
    # small graphs cap at n (k = n is exact Brandes)
    assert auto_num_sources(N) == N
    assert auto_num_sources(1) == 1
    # monotone: more vertices need more sources; tighter eps needs more
    assert auto_num_sources(10**8) > auto_num_sources(10**6)
    assert auto_num_sources(10**6, eps=0.05) > auto_num_sources(10**6, eps=0.1)
