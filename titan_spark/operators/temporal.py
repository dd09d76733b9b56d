"""Temporal joins Spark lacks as built-ins: as-of join and
point-in-interval range join.

``asof_join`` matches every left row to the most recent right row at
or before its timestamp (direction="backward"; "forward" = earliest at
or after), within optional partition keys — the point-in-time join
every feature store / market-data / telemetry pipeline needs.

Spark-first plan: NOT a θ-join (an inequality join degenerates to
broadcast-nested-loop or an n·m explosion). Both sides union into
one stream tagged by side, one window per partition key ordered by
(ts, side-priority) carries the best preceding right row forward (a
running ``max``/``min`` over (ts, values) structs — NULL left rows
are ignored by the aggregate), and left rows project their carried
match. Cost: ONE shuffle on the partition key + a per-key sort —
linear at any scale, the same shape as sessionization. Skewed keys are
ordinary window skew (AQE-split territory), never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "_asof_side"  # 0 = right (carry source), 1 = left (probe)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """Point-in-time join: each left row gets the latest right row with
    ``right_ts <= left_ts`` (backward; ``>=`` for forward) sharing the
    ``on`` keys; no match → NULLs. ``strict=True`` uses ``<`` / ``>``
    (exclude simultaneous rows). Tie among simultaneous right rows →
    the one latest in (ts, then input order is irrelevant: resolved
    deterministically by the max of the carried struct).

    Returns all left columns + the matched right ``value_cols``
    (default: all non-key, non-ts right columns) suffixed, plus
    ``{right_ts}{suffix}`` — the matched timestamp.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != right_ts]
    # tag and align schemas: left carries its full row; right carries
    # (ts, values) as one struct so a single last() carries everything
    rstruct = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_evt_ts"),
        F.lit(0).alias(_SIDE),
        rstruct.alias("_r"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_evt_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    both = r.unionByName(l)
    if direction == "backward":
        # at equal ts, right sorts before left (side 0 < 1) so a
        # simultaneous right row IS visible to the left row; strict
        # flips the side order so it is not
        side_order = F.col(_SIDE).desc() if strict else F.col(_SIDE).asc()
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_evt_ts").asc(), side_order)
            .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
        )
        carried = F.max("_r").over(w)
    elif direction == "forward":
        # same side rule as backward: in the desc-ordered stream a
        # simultaneous right row must still sort BEFORE the left row
        # to be visible non-strict (and after it under strict)
        side_order = F.col(_SIDE).desc() if strict else F.col(_SIDE).asc()
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_evt_ts").desc(), side_order)
            .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
        )
        carried = F.min("_r").over(w)
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    matched = both.withColumn("_m", carried).filter(F.col(_SIDE) == 1)
    return matched.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        F.col("_m._ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: str | list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Range join (point-in-interval): each point row matched to every
    interval row containing it, optionally within partition keys.

    Spark-first plan: a naive ``p.ts BETWEEN i.start AND i.end``
    θ-join compiles to BroadcastNestedLoop — quadratic at scale. This
    buckets time into ``bucket_seconds`` cells: intervals EXPLODE over
    the cells they cover (replication factor = span/bucket, bounded
    and chosen by the caller), points map to exactly ONE cell, and the
    match becomes an equi-join on (keys…, cell) + an exact residual
    filter. Each qualifying pair meets in exactly one cell (the
    point's), so no post-join dedup is needed. One shuffle on the
    bucketed key; AQE handles hot cells.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    us = F.lit(int(bucket_seconds) * 1_000_000)
    p = points.withColumn("_cell", (F.unix_micros(F.col(point_ts)) / us).cast("long"))
    i = intervals.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start_ts)) / us).cast("long"),
                (F.unix_micros(F.col(end_ts)) / us).cast("long"),
            )
        ),
    )
    cond = [p["_cell"] == i["_cell"]] + [p[k] == i[k] for k in keys]
    residual = (F.unix_micros(p[point_ts]) >= F.unix_micros(i[start_ts])) & (
        F.unix_micros(p[point_ts]) <= F.unix_micros(i[end_ts])
    )
    joined = p.join(i, [c for c in cond] + [residual], how)
    # project: all point columns + interval columns (minus dup keys/cell)
    pcols = [p[c].alias(c) for c in points.columns]
    icols = [
        i[c].alias(f"{c}_ivl") for c in intervals.columns if c not in keys
    ]
    return joined.select(*pcols, *icols)
