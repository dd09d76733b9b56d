"""Per-group top-k — the vertex-centric ``local(order().limit(k))`` helper.

Reference semantics: Titan serves per-vertex ordered+limited adjacency
straight off a sort-key slice (``BasicVertexCentricQueryBuilder.java:
500-533``; test ``TitanGraphTest.java:3393-3398``). On Spark the same
operator is a rank-filter window; at scale the window is preceded by a
hash shuffle on the group key only — no global sort — and AQE handles
skewed groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(specs) -> list[Column]:
    cols: list[Column] = []
    for s in specs:
        if isinstance(s, Column):
            cols.append(s)
        elif isinstance(s, tuple):
            name, direction = s
            c = F.col(name)
            cols.append(c.desc() if str(direction).lower().startswith("desc") else c.asc())
        elif isinstance(s, str) and s.startswith("-"):
            cols.append(F.col(s[1:]).desc())
        else:
            cols.append(F.col(s).asc())
    return cols


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_specs,
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the first k rows of each group under the given order.

    ``order_specs`` entries: "col", "-col" (desc), ("col", "desc"), or a
    Column. Include a unique tiebreaker for deterministic results.
    """
    w = Window.partitionBy(*group_cols).orderBy(*_order_cols(order_specs))
    ranked = df.withColumn("_rn", F.row_number().over(w))
    out = ranked.filter(F.col("_rn") <= k)
    if rank_col:
        return out.withColumnRenamed("_rn", rank_col)
    return out.drop("_rn")
