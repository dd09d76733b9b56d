"""Generic local(subtraversal) and map/flatMap/sideEffect steps.

Reference: LocalStep semantics per TitanGraphTest.java:3393-3398
(local(outE.order.by(weight).limit(k)) scoped per vertex, planned by
TitanLocalQueryOptimizerStrategy.java:46-66) and the generic
map/flatMap/sideEffect membership of the ProcessStandardSuite
(BerkeleyTitanProcessTest.java:12-15).
"""

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _battle_times(df, key="time"):
    return sorted(r[key] for r in df.collect())


def test_local_scoped_count(gods):
    """local(outE('battled').count()) -> one row per origin."""
    out = gods.V().has_label("god", "demigod").local_(lambda t: t.outE("battled").count())
    rows = {r["local_id"]: r["count"] for r in out.collect()}
    herc = gods.V().has("name", "hercules").ids().collect()[0][0]
    assert rows == {herc: 3}


def test_local_order_limit_matches_local_top_k(gods):
    """The generic scoped order+limit subsumes local_top_k."""
    generic = (
        gods.V()
        .has_label("demigod")
        .local_(lambda t: t.outE("battled").order_by("-time").limit(2))
    )
    special = gods.V().has_label("demigod").outE("battled").local_top_k(2, "-time", "edge_id")
    assert _battle_times(generic.df.select("time")) == _battle_times(
        special.df.select("time")
    )
    # the scope tag is dropped from the continuing frontier
    assert "_t_local" not in generic.df.columns


def test_local_scoped_sum_of_top_k(gods):
    """Per-vertex sum of top-2 edge weights — the VERDICT example that
    local_top_k alone cannot express."""
    out = gods.V().has_label("demigod").local_(
        lambda t: t.outE("battled").order_by("-time").limit(2).sum_("time")
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["sum"] == 14  # times {1,2,12} -> 12+2


def test_local_scoped_slices(gods):
    """range_/tail_/skip_ compile per-origin inside local_."""
    base = gods.V().has_label("demigod")
    mid = base.local_(lambda t: t.outE("battled").range_(1, 2, "time"))
    assert _battle_times(mid.df.select("time")) == [2]
    tail = base.local_(lambda t: t.outE("battled").tail_(1, "time"))
    assert _battle_times(tail.df.select("time")) == [12]
    rest = base.local_(lambda t: t.outE("battled").skip_(1, "time"))
    assert _battle_times(rest.df.select("time")) == [2, 12]


def test_local_scoped_fold_and_mean(gods):
    out = gods.V().has_label("demigod").local_(
        lambda t: t.outE("battled").fold(F.col("time"))
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["folded"] == [1, 2, 12]
    m = gods.V().has_label("demigod").local_(lambda t: t.outE("battled").mean_("time"))
    assert m.collect()[0]["mean"] == pytest.approx(5.0)


def test_local_scoped_sample_and_dedup(gods):
    samp = gods.V().has_label("demigod").local_(
        lambda t: t.outE("battled").sample_(2)
    )
    assert samp.df.count() == 2
    # dedup per origin: monsters battled (dst) are already unique,
    # so per-origin dedup keeps all three
    ded = gods.V().has_label("demigod").local_(
        lambda t: t.outE("battled").dedup("dst")
    )
    assert ded.df.count() == 3


def test_local_nesting_rejected(gods):
    with pytest.raises(ValueError, match="nest"):
        gods.V().local_(lambda t: t.local_(lambda s: s.outE().count()))


def test_map_column_form(gods):
    t = gods.V().has_label("demigod").map_(F.col("age") * 2, name="double_age")
    rows = t.values("name", "double_age").collect()
    assert [(r["name"], r["double_age"]) for r in rows] == [("hercules", 60)]


def test_map_callable_takes_first_result(gods):
    """map(subtraversal) keeps ONE result per origin — the earliest
    battle under the recorded order."""
    t = gods.V().has_label("demigod").map_(
        lambda s: s.outE("battled").order_by("time")
    )
    assert _battle_times(t.df.select("time")) == [1]


def test_flat_map_equals_expansion(gods):
    a = gods.V().has_label("god").flat_map_(lambda s: s.out("brother"))
    b = gods.V().has_label("god").out("brother")
    assert sorted(r[0] for r in a.ids().collect()) == sorted(
        r[0] for r in b.ids().collect()
    )


def test_side_effect_stream_unchanged(gods):
    seen = {}

    def probe(t):
        seen["n"] = t.count_value()
        return "ignored"

    t = gods.V().has_label("god").side_effect_(probe).out("brother")
    assert seen["n"] == 3
    assert t.ids().count() == 6  # 3 gods x 2 brothers


def test_local_group_count_scoped(gods):
    out = gods.V().has_label("demigod").local_(
        lambda t: t.out("battled").group_count("label")
    )
    assert isinstance(out, DataFrame)
    rows = [(r["label"], r["count"]) for r in out.collect()]
    assert rows == [("monster", 3)]
