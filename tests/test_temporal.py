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


def test_point_in_interval_join_exact_and_boundaries(spark):
    import datetime as dt

    from titan_spark.operators.temporal import point_in_interval_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    points = spark.createDataFrame(
        [(1, "u", ts(0)), (2, "u", ts(61)), (3, "u", ts(59)), (4, "w", ts(30))],
        ["pid", "user", "t"],
    )
    # interval [0, 60] minutes for user u; [0, 60] for v (no points)
    intervals = spark.createDataFrame(
        [(10, "u", ts(0), ts(60)), (11, "v", ts(0), ts(60))],
        ["iid", "user", "lo", "hi"],
    )
    got = {
        (r["pid"], r["iid_ivl"])
        for r in point_in_interval_join(
            points, intervals, "t", "lo", "hi", on="user", bucket_seconds=600
        ).collect()
    }
    # boundary-inclusive at lo; 59min inside; 61min outside; key w unmatched
    assert got == {(1, 10), (3, 10)}


def test_point_in_interval_join_matches_theta_join(spark):
    """Bucketed equi-join == naive θ-join on a random-ish fixture."""
    import datetime as dt

    from pyspark.sql import functions as F

    from titan_spark.operators.temporal import point_in_interval_join

    t0 = dt.datetime(2024, 1, 1)
    pts = [(i, "k", t0 + dt.timedelta(minutes=(i * 37) % 300)) for i in range(60)]
    ivs = [
        (100 + j, "k", t0 + dt.timedelta(minutes=j * 25), t0 + dt.timedelta(minutes=j * 25 + 40))
        for j in range(10)
    ]
    p = spark.createDataFrame(pts, ["pid", "user", "t"])
    i = spark.createDataFrame(ivs, ["iid", "user", "lo", "hi"])
    fast = {
        (r["pid"], r["iid_ivl"])
        for r in point_in_interval_join(p, i, "t", "lo", "hi", on="user", bucket_seconds=900).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in p.join(
            i, (p["user"] == i["user"]) & (p["t"] >= i["lo"]) & (p["t"] <= i["hi"])
        ).select("pid", "iid").collect()
    }
    assert fast == naive and len(fast) > 0
