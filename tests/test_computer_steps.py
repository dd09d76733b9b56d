"""Chainable computer-traversal steps: g.V().pageRank() /
peerPressure() (TinkerPop computer() sugar,
FulgoraGraphComputer.java:21,53-54)."""

import pytest
from pyspark.sql import functions as F

from titan_spark.compute import label_propagation, pagerank


def test_page_rank_step_annotates_frontier(gods):
    # whole-graph scores, regardless of the frontier restriction
    t = gods.V().has_label("god").page_rank(iterations=5)
    rows = {r["id"]: r["pagerank"] for r in t.to_df("id", "pagerank").collect()}
    standalone = {
        r["id"]: r["pagerank"] for r in pagerank(gods, iterations=5).collect()
    }
    assert set(rows) == {r["id"] for r in gods.V().has_label("god").to_df("id").collect()}
    for i, s in rows.items():
        assert abs(s - standalone[i]) < 1e-9
    # composes with downstream ordering like any property
    top = (
        gods.V().page_rank(iterations=5)
        .order_by(("pagerank", "desc"), ("id", "asc")).limit(3)
        .to_df("id").collect()
    )
    exp = sorted(standalone.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [r["id"] for r in top] == [i for i, _ in exp]


def test_peer_pressure_step(gods):
    t = gods.V().peer_pressure(iterations=3)
    rows = {r["id"]: r["cluster"] for r in t.to_df("id", "cluster").collect()}
    standalone = {
        r["id"]: r["community"] for r in label_propagation(gods, iterations=3).collect()
    }
    assert rows == standalone


def test_computer_steps_require_vertex_frontier(gods):
    with pytest.raises(ValueError, match="vertex step"):
        gods.E().page_rank()
    with pytest.raises(ValueError, match="vertex step"):
        gods.E().peer_pressure()
