"""Skew-aware operators: salted two-phase aggregation and salted joins.

Titan handles supernodes by partitioning hot vertices across the
cluster (``VertexIDAssigner``/``IDManager.java:24``; SURVEY §4.2).
On Spark, AQE's skew-join splitting covers joins automatically; for
aggregations over pathologically hot keys (a vertex with 10⁸ edges at
100 TB) the classic fix is salting — pre-aggregate on (key, salt),
then merge. Both phases are map-side combinable, so the hot key's
traffic splits across ``n_salts`` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# decomposable aggregates: (partial expr builder, merge expr builder)
_MERGEABLE = {
    "count": (lambda c: F.count(F.lit(1)), lambda p: F.sum(p)),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str | Column | None]],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase aggregation with a random salt on the group key.

    ``aggs``: output name → (fn, input col), fn ∈ count/sum/min/max
    (the decomposable set). Example::

        salted_agg(edges, ["src"], {"degree": ("count", None),
                                    "w": ("sum", "weight")})
    """
    partials = []
    merges = []
    for name, (fn, col) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(f"non-decomposable agg {fn!r}; use avg = sum/count")
        pbuild, mbuild = _MERGEABLE[fn]
        c = F.col(col) if isinstance(col, str) else col
        partials.append(pbuild(c).alias(f"_p_{name}"))
        merges.append(mbuild(F.col(f"_p_{name}")).alias(name))
    salted = df.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    phase1 = salted.groupBy(*group_cols, "_salt").agg(*partials)
    return phase1.groupBy(*group_cols).agg(*merges)


def salted_join_broadcast_hot(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: list,
) -> DataFrame:
    """Split-and-union join for known hot keys: the hot slice joins
    against a broadcast of the small side's hot rows; the cold slice
    joins normally. (AQE skew-join does this adaptively; this is the
    explicit form for when hot keys are known up front.)"""
    hot = F.col(key).isin(hot_keys)
    hot_join = big.filter(hot).join(F.broadcast(small.filter(hot)), key)
    cold_join = big.filter(~hot).join(small.filter(~hot), key)
    return hot_join.unionByName(cold_join)
