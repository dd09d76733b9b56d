"""Mergeable frequency sketches: count-min heavy hitters.

Cormode & Muthukrishnan, "An Improved Data Stream Summary: The
Count-Min Sketch and its Applications", J. Algorithms 2005. The CM
matrix is d hash rows × w counters; est(x) = min_i CM[i][h_i(x)] is an
overestimate bounded by ε·N with probability 1−δ (w = ⌈e/ε⌉,
d = ⌈ln 1/δ⌉).

Why it matters at 100 TB: the sketch is a FIXED-SIZE mergeable
aggregate — per-partition partial matrices merge by elementwise sum,
so frequency estimation over an open vocabulary costs d·w counters of
driver traffic regardless of corpus size, where an exact groupBy
carries |vocab| rows (billions on web text). The trade is bounded
overestimation — acceptable for heavy-hitter screening, hot-key
detection before a skew join, or stopword discovery.

Determinism/portability: row hashes are the portable h60 with a fixed
per-row salt, so the whole sketch — and the heavy-hitter ranking over
it — replays in ANSI SQL (same pattern as the MinHash oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from titan_spark.functions.hashing import portable_hash64, portable_hash64_sql
from titan_spark.functions.text import tokenize


def _row_bucket(col, row: int, width: int):
    return F.pmod(portable_hash64(F.concat(F.lit(f"cm{row}:"), col)), F.lit(width))


def cms_build(
    items: DataFrame,
    item_col: str = "item",
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch: (row, bucket, c) counters — d·w rows max.

    ONE pass over the item stream: each item explodes into its d
    (row, bucket) cells (the d-way union form re-scanned the stream
    per hash row — d corpus reads at scale); the groupBy is map-side
    combinable, so the shuffle carries ≤ d·w rows per task — the
    mergeable-aggregate property that makes the sketch cheap at any
    scale."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _row_bucket(F.col(item_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    exploded = items.select(w.alias("_w"), F.explode(cells).alias("_rb"))
    return (
        exploded.groupBy(F.col("_rb.row").alias("row"), F.col("_rb.bucket").alias("bucket"))
        .agg(F.sum("_w").cast("long").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate counts for the query items: est = min over rows
    of the item's counter (the classic CM bound: true ≤ est ≤
    true + ε·N w.h.p.). The sketch side is ≤ d·w rows — always a
    broadcast join."""
    keyed = queries.select(
        F.col(item_col),
        *[
            _row_bucket(F.col(item_col), r, width).alias(f"_b{r}")
            for r in range(depth)
        ],
    )
    out = keyed
    for r in range(depth):
        side = sketch.filter(F.col("row") == r).select(
            F.col("bucket").alias(f"_b{r}"), F.col("c").alias(f"_c{r}")
        )
        out = out.join(F.broadcast(side), f"_b{r}", "left")
    est = F.least(*[F.coalesce(F.col(f"_c{r}"), F.lit(0)) for r in range(depth)])
    return out.select(item_col, est.alias("est"))


def cms_heavy_hitters(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Top-k corpus terms by CM-sketch estimate: (term, est) ranked
    (est desc, term asc).

    The candidate set here is the distinct-term relation (exact pass —
    fine for a verifiable benchmark); in a true streaming deployment
    candidates come from a Misra–Gries pass or the arriving batch
    itself, keeping everything fixed-size. est ≥ true count always, so
    no true heavy hitter is missed at the ε implied by width."""
    terms = df.select(F.explode(tokenize(F.col(text_col))).alias("term"))
    sketch = cms_build(terms, "term", depth=depth, width=width)
    cand = terms.distinct()
    est = cms_estimate(sketch, cand, "term", depth, width)
    return (
        est.orderBy(F.col("est").desc(), F.col("term").asc())
        .limit(k)
        .select("term", "est")
    )


def cms_bucket_sql(expr: str, row: int, width: int) -> str:
    """DuckDB twin of the salted row-bucket hash (oracle builder)."""
    salted = f"'cm{row}:' || {expr}"
    return f"({portable_hash64_sql(salted)} % {width})"
