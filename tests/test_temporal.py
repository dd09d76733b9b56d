"""As-of join semantics (operators/temporal.py)."""

from titan_spark.operators.temporal import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 20), (3, "u", 5), (4, "v", 10)],
        ["event_id", "user", "t"],
    )
    right = spark.createDataFrame(
        [("u", 10, 100.0), ("u", 15, 150.0), ("v", 30, 300.0)],
        ["user", "t", "price"],
    )
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: (r["t_right"], r["price_right"])
        for r in asof_join(left, right, on="user", left_ts="t", right_ts="t").collect()
    }
    assert got[1] == (10, 100.0)   # simultaneous row visible (non-strict)
    assert got[2] == (15, 150.0)   # latest at-or-before 20
    assert got[3] == (None, None)  # nothing before t=5
    assert got[4] == (None, None)  # v's only right row is later


def test_asof_backward_strict(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: r["t_right"]
        for r in asof_join(
            left, right, on="user", left_ts="t", right_ts="t", strict=True
        ).collect()
    }
    assert got[1] is None  # t=10 excluded under strict <
    assert got[2] == 15


def test_asof_forward(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: r["t_right"]
        for r in asof_join(
            left, right, on="user", left_ts="t", right_ts="t", direction="forward"
        ).collect()
    }
    assert got[1] == 10   # simultaneous counts forward too
    assert got[3] == 10   # earliest at-or-after 5
    assert got[2] is None  # nothing after 20
    assert got[4] == 30


def test_asof_preserves_left_rowcount(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, on="user", left_ts="t", right_ts="t").count() == left.count()
