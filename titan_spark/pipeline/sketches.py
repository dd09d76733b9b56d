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

from titan_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
    resolve_hash_fn,
)
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


# ---------------------------------------------------------------- HyperLogLog
#
# Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog: the analysis of a
# near-optimal cardinality estimation algorithm", AofA 2007. m = 2^p
# registers; each item's h60 hash spends p low bits on the bucket and
# the remaining W = 60-p bits on rho = leading-zero run + 1; register
# j keeps max rho. Estimate = alpha_m * m^2 / sum(2^-M_j) with the
# standard small-range linear-counting correction.
#
# Why it matters at 100 TB: COUNT(DISTINCT) over an open domain (users,
# URLs, shingles) shuffles the full key set; the HLL register table is
# a FIXED-SIZE mergeable aggregate (elementwise max), so distinct
# estimation costs m rows of traffic regardless of corpus size and
# composes across shards/days by a trivial union+max — the same
# mergeability contract as the CM sketch above. Spark ships
# approx_count_distinct (also HLL) for the one-shot case; this
# implementation exposes the REGISTERS so sketches persist, merge
# across pipelines, and replay bit-identically in ANSI SQL (the
# portable-h60 trick — approx_count_distinct's internal hash cannot be
# oracle-checked).

_HLL_BITS = 60  # width of the portable h60 hash


def hll_build(items: DataFrame, item_col: str = "item", p: int = 8) -> DataFrame:
    """One pass → the register table (bucket, max_rho), ≤ 2^p rows.

    bucket = h % m (low p bits); rho = position of the first 1-bit in
    the remaining W-bit window, via ``W - length(bin(rest)) + 1``
    (``bin`` is minimal-width in both Spark and DuckDB, so bit_length
    is a string length — no float log2 edge cases). The groupBy-max is
    map-side combinable: each task emits ≤ m rows."""
    m = 1 << p
    w = _HLL_BITS - p
    h = portable_hash64(F.col(item_col))
    # exact integer h // m: Spark's `/` casts the 60-bit h to double,
    # which is inexact above 2^53 and would drift rest (and hence rho
    # at power-of-two boundaries) vs DuckDB's exact `//`. m = 2^p and
    # h >= 0, so an unsigned right shift IS the exact quotient.
    rest = F.shiftrightunsigned(h, p).cast("long")
    rho = (
        F.when(rest == 0, F.lit(w + 1))
        .otherwise(F.lit(w) - F.length(F.bin(rest)) + 1)
        .cast("int")
    )
    return (
        items.select(
            F.pmod(h, F.lit(m)).cast("int").alias("bucket"), rho.alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_build_grouped(
    items: DataFrame, group_cols: list[str], item_col: str = "item", p: int = 8
) -> DataFrame:
    """Register tables PER GROUP → (group_cols…, bucket, max_rho) —
    one sketch per key (per hour, per shard, per source). Each group's
    registers later merge losslessly with :func:`hll_merge`'s
    elementwise max (drop the group columns first), which is the
    composition pattern ``approx_count_distinct`` cannot express: its
    sketch state is opaque, these registers are rows."""
    m = 1 << p
    w = _HLL_BITS - p
    h = portable_hash64(F.col(item_col))
    rest = F.shiftrightunsigned(h, p).cast("long")
    rho = (
        F.when(rest == 0, F.lit(w + 1))
        .otherwise(F.lit(w) - F.length(F.bin(rest)) + 1)
        .cast("int")
    )
    return (
        items.select(
            *group_cols,
            F.pmod(h, F.lit(m)).cast("int").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate_grouped(
    sketch: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Per-group (group_cols…, estimate) from a grouped register table
    — the same raw/linear-counting estimator as :func:`hll_estimate`,
    in pure column algebra per group."""
    m = 1 << p
    alpha = (
        0.7213 / (1.0 + 1.079 / m)
        if m >= 128
        else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    )
    agg = sketch.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("s"),
        F.count(F.lit(1)).alias("nz"),
    )
    zeros = F.lit(m) - F.col("nz")
    raw = F.lit(alpha * m * m) / (F.coalesce(F.col("s"), F.lit(0.0)) + zeros)
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est).cast("long").alias("estimate")
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables from independent passes (shards, days,
    engines) into one sketch: elementwise max — the lossless HLL merge."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(sketch: DataFrame, p: int = 8) -> DataFrame:
    """One-row (estimate) from a register table. Buckets absent from
    the table are empty registers (rho 0 → 2^-0 = 1 each); linear
    counting replaces the raw estimate in the small range
    (E ≤ 2.5m with empty registers), per the published algorithm."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    agg = sketch.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("s"),
        F.count(F.lit(1)).alias("nz"),
    )
    zeros = F.lit(m) - F.col("nz")
    raw = F.lit(alpha * m * m) / (F.coalesce(F.col("s"), F.lit(0.0)) + zeros)
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw)
    return agg.select(F.round(est).cast("long").alias("estimate"))


def hll_distinct(items: DataFrame, item_col: str = "item", p: int = 8) -> DataFrame:
    """Convenience: build + estimate in one call → one-row (estimate)."""
    return hll_estimate(hll_build(items, item_col, p), p)


def hll_register_sql(
    expr: str,
    from_clause: str,
    p: int = 8,
    group_expr: str | None = None,
    group_alias: str = "grp",
) -> str:
    """DuckDB twin of :func:`hll_build` / :func:`hll_build_grouped`
    (oracle builder): the exact same registers from the same h60 bit
    budget, optionally per ``group_expr``."""
    m = 1 << p
    w = _HLL_BITS - p
    h = portable_hash64_sql(expr)
    gsel = f"{group_expr} AS {group_alias}, " if group_expr else ""
    gout = f"{group_alias}, " if group_expr else ""
    gby = "GROUP BY 1, 2" if group_expr else "GROUP BY 1"
    return f"""
    WITH hh AS (SELECT {gsel}{h} AS h FROM {from_clause}),
    reg AS (
        SELECT {gout}CAST(h % {m} AS INT) AS bucket,
               CAST(max(CASE WHEN h // {m} = 0 THEN {w + 1}
                    ELSE {w} - length(bin(h // {m})) + 1 END) AS INT) AS max_rho
        FROM hh {gby}
    )
    SELECT {gout}bucket, max_rho FROM reg
"""


# ---------------------------------------------------------------------------
# DDSketch — mergeable quantiles with a relative-error guarantee


def dd_build(
    df: DataFrame,
    value_col: str = "value",
    alpha: float = 0.01,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """DDSketch (Masson/Rim/Lee, VLDB 2019) bucket table →
    (group_cols…, sign, bucket, n) — the quantile member of the
    mergeable-sketch family (HLL registers, CMS counters): bucket =
    ceil(log_γ |v|) with γ = (1+α)/(1-α), so every value in a bucket
    is within relative error α of the bucket midpoint, merging is
    summing counts per bucket (across shards/windows/days), and the
    sketch is O(log(max/min)/α) rows regardless of data volume —
    exact-percentile economics (a full sort, or Spark's
    approx_percentile whose GK state is opaque) replaced by a
    persistable row table. Zeros land in a dedicated (sign=0) bucket;
    negative values mirror into sign=-1 buckets of |v|. The log ratio
    is rounded to 9 decimals before ceil so Spark and the SQL oracle
    land every boundary value in the same bucket (ulp-stable replay).
    """
    import math

    gamma = (1 + alpha) / (1 - alpha)
    lg = math.log(gamma)
    v = F.col(value_col).cast("double")
    sign = F.when(v > 0, 1).when(v < 0, -1).otherwise(0).cast("int")
    b = F.ceil(F.round(F.log(F.abs(v)) / F.lit(lg), 9)).cast("long")
    bucket = F.when(sign == 0, F.lit(0).cast("long")).otherwise(b)
    return (
        df.select(*group_cols, sign.alias("sign"), bucket.alias("bucket"))
        .groupBy(*group_cols, "sign", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dd_merge(*sketches: DataFrame) -> DataFrame:
    """Union bucket tables from independent passes and sum counts —
    the lossless DDSketch merge (bucket boundaries are data-independent
    so merged error stays ≤ α)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "n"]
    return out.groupBy(*keys).agg(F.sum("n").alias("n"))


def dd_quantiles(
    sketch: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    alpha: float = 0.01,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group_cols…, q, estimate) per requested quantile: walk buckets
    in value order (sign asc, then signed bucket), take the first
    bucket whose cumulative count exceeds floor(q·(n−1)), and report
    the bucket midpoint 2γ^b/(γ+1) with the sign applied — the
    paper's estimator, within relative error α of the true quantile.
    All window/aggregate algebra over the sketch-sized table."""
    import math

    from pyspark.sql import Window

    gamma = (1 + alpha) / (1 - alpha)
    key = F.when(F.col("sign") == -1, -F.col("bucket")).otherwise(F.col("bucket"))
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.col("sign").asc(), key.asc()
    )
    rows = sketch.select(
        *group_cols,
        "sign",
        "bucket",
        "n",
        F.sum("n").over(w).alias("_cum"),
    )
    tot = sketch.groupBy(*group_cols).agg(F.sum("n").alias("_tot"))
    rows = rows.join(tot, list(group_cols)) if group_cols else rows.crossJoin(
        F.broadcast(tot)
    )
    est = F.when(F.col("sign") == 0, F.lit(0.0)).otherwise(
        F.col("sign")
        * 2.0
        * F.pow(F.lit(gamma), F.col("bucket"))
        / F.lit(gamma + 1.0)
    )
    cand = rows.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    ).filter(F.col("_cum") > F.floor(F.col("q") * (F.col("_tot") - 1)))
    skey = F.when(F.col("sign") == -1, -F.col("bucket")).otherwise(F.col("bucket"))
    sortable = F.col("sign").cast("long") * F.lit(10**15) + skey
    return (
        cand.groupBy(*group_cols, "q")
        .agg(F.min_by(F.round(est, 6), sortable).alias("estimate"))
        .select(*group_cols, "q", "estimate")
    )


# ---------------------------------------------------------------------------
# Bloom filter — mergeable set-membership sketch


def _bloom_positions(col, m_bits: int, k: int, hash_fn="portable"):
    """Array of the k bit positions an item sets/probes: position_i =
    h(salt_i ‖ item) mod m with the per-function salt ``bf{i}:`` (the
    same salted-h60 construction as the CMS row hashes, so the whole
    filter replays in ANSI SQL when ``hash_fn='portable'``)."""
    h = resolve_hash_fn(hash_fn)
    return F.array(
        *[
            F.pmod(h(F.concat(F.lit(f"bf{i}:"), col)), F.lit(m_bits)).cast("long")
            for i in range(k)
        ]
    )


def bloom_build(
    items: DataFrame,
    item_col: str = "item",
    m_bits: int = 1 << 20,
    k: int = 3,
    hash_fn="portable",
) -> DataFrame:
    """One pass → the filter as its SET-BIT table: DataFrame(pos) of
    distinct bit positions, ≤ min(k·|distinct items|, m_bits) rows.

    The membership member of the mergeable-sketch family (CMS counters,
    HLL registers, DDSketch buckets): Bloom (CACM 1970) answers
    "definitely absent / maybe present" with false-positive rate
    ≈ (1 − e^(−k·n/m))^k and NO false negatives. Row-set representation
    instead of packed words because rows are what Spark merges, joins,
    and persists natively: union+distinct is the lossless filter merge
    (= bitwise OR), a broadcast semi-join is the probe, and the table
    is bounded by m_bits regardless of corpus size — so a benchmark
    eval set, a blocklist, or a seen-URL set summarizes to a fixed-size
    structure that ships to every probe site instead of the raw keys.

    Reference parity: Titan answers "definitely no such index entry"
    with bounded state via its index-store metadata; the engine-level
    analog of a membership screen in front of an expensive lookup.
    """
    return (
        items.select(
            F.explode(
                _bloom_positions(F.col(item_col), m_bits, k, hash_fn)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Union set-bit tables from independent passes/shards — the
    lossless Bloom merge (bitwise OR) as long as every side used the
    same (m_bits, k, hash_fn)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct()


def bloom_probe(
    df: DataFrame,
    probe_col,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 3,
    hash_fn="portable",
    out_col: str = "maybe_present",
    broadcast: bool = True,
) -> DataFrame:
    """df + boolean ``out_col``: true iff ALL k positions of
    ``probe_col`` are set in the filter (maybe present — FP rate per
    the build's n/m/k), false = definitely absent.

    Plan shape: explode the k positions (k-fold fanout of the probe
    side only), one join against the ≤ m_bits-row set-bit table, then
    an all-k count per input row — the probe side never shuffles its
    payload columns; only (row id, pos) pairs move. ``broadcast``
    force-hints the filter side; pass False for filters sized near a
    large m_bits (≥ ~2^26 set rows) and let AQE pick the strategy —
    the same driver-OOM guard as ngram_decontaminate's gram set.
    """
    c = probe_col if not isinstance(probe_col, str) else F.col(probe_col)
    keyed = df.withColumn("_bf_rid", F.monotonically_increasing_id())
    pos = keyed.select(
        "_bf_rid",
        F.explode(_bloom_positions(c, m_bits, k, hash_fn)).alias("pos"),
    )
    right = F.broadcast(bloom.select("pos")) if broadcast else bloom.select("pos")
    hits = (
        pos.join(right, "pos")
        .groupBy("_bf_rid")
        .agg(F.count(F.lit(1)).alias("_bf_hits"))
    )
    return (
        keyed.join(hits, "_bf_rid", "left")
        .withColumn(out_col, F.coalesce(F.col("_bf_hits"), F.lit(0)) == k)
        .drop("_bf_rid", "_bf_hits")
    )


def bloom_positions_sql(expr: str, m_bits: int, k: int) -> list[str]:
    """DuckDB twins of :func:`_bloom_positions` (oracle builder): the
    k salted-h60 position expressions over an arbitrary SQL expr."""
    out = []
    for i in range(k):
        salted = f"'bf{i}:' || {expr}"
        out.append(f"({portable_hash64_sql(salted)} % {m_bits})")
    return out


# ---------------------------------------------------------------------------
# KMV / Theta sketch: bottom-k distinct sampling with set intersection

_KMV_SPACE = float(2**60)  # h60 hash space size


def kmv_build(
    items: DataFrame,
    set_col: str,
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """Bottom-k (KMV) sketch per set — the Theta-sketch family
    (Beyer et al. 2007 "On Synopses for Distinct-Value Estimation
    Under Multiset Operations"; Apache DataSketches' theta sketch):
    keep the k smallest distinct h60 hash values of each set's items,
    plus ``theta_h`` = the (k+1)-th smallest hash (the first EXCLUDED
    value) — every retained hash is < theta_h, and theta_h/2⁶⁰
    estimates the sampled fraction of the hash space, so
    |S| ≈ k·2⁶⁰/theta_h. A set with ≤ k distinct items is stored
    EXACTLY (theta_h = 2⁶⁰, the whole space). Rows:
    (set_col, h, theta_h, n_kept) — one row per retained hash.

    Unlike HLL (:func:`hll_build`), a KMV sketch supports set
    INTERSECTION natively (:func:`kmv_intersection`): the retained
    hashes are a uniform sample of each set, so hashes below both
    thetas are a uniform sample of the intersection. The portable h60
    keeps the whole pipeline DuckDB-replayable.

    Scale shape at 100 TB: the distinct pass is a map-side-combinable
    groupBy on (set, hash) — 8-byte hashes shuffle, never items; the
    bottom-k rank is a window sort within each set's partition, the
    same shuffle key (and cost class) as the distinct itself; sketch
    output is ≤ k+1 rows per set, so every downstream op touches
    kilobytes per set regardless of corpus size.
    """
    from pyspark.sql import Window

    from titan_spark.compute.checkpointing import cut_lineage

    h = portable_hash64(F.col(item_col))
    d = items.select(F.col(set_col).alias("s"), h.alias("h")).distinct()
    w = Window.partitionBy("s").orderBy("h")
    # materialized ONCE: the ranked relation feeds both the theta
    # summary and the retained rows — without the cut, the
    # corpus-wide distinct + per-set window sort would run twice per
    # sketch build (and once more per consumer of the build).
    r = cut_lineage(
        d.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= k + 1
        ),
        eager=True,
    )
    summ = r.groupBy("s").agg(
        F.max(F.when(F.col("_rn") == k + 1, F.col("h"))).alias("_th"),
        F.sum(F.when(F.col("_rn") <= k, 1).otherwise(0)).alias("n_kept"),
    ).select(
        "s",
        F.coalesce(F.col("_th"), F.lit(int(_KMV_SPACE))).alias("theta_h"),
        F.col("n_kept").cast("long").alias("n_kept"),
    )
    return (
        r.filter(F.col("_rn") <= k)
        .select("s", "h")
        .join(summ, "s")
        .select(F.col("s").alias(set_col), "h", "theta_h", "n_kept")
    )


def kmv_intersection(
    items: DataFrame,
    set_col: str,
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """Distinct-intersection cardinality for every unordered pair of
    sets, estimated from KMV sketches (the Theta-sketch intersection:
    DataSketches' a-priori set operation). For each pair,
    θ = min(θ_a, θ_b); hashes retained by BOTH sketches and < θ are a
    uniform sample of A∩B at sampling rate θ/2⁶⁰, so
    |A∩B| ≈ n_common·2⁶⁰/θ. Exact when both sets fit in k. Returns
    (set_a, set_b, n_common, est_common) with set_a < set_b;
    est_common rounded to 4dp (the cross-engine float contract).
    Relative standard error ~1/√(k−1) on the DOMINATING set size,
    scaled by the Jaccard — the documented accuracy trade of theta
    intersections (pytest pins planted-overlap recovery at 3σ).

    Scale shape: after :func:`kmv_build` the relation is ≤ k+1 rows
    per set; the pair join keys on the hash value (equi-join over
    sketch rows only) and the final agg groups on the set pair —
    nothing downstream of the sketch build ever rescans the corpus.
    """
    from titan_spark.compute.checkpointing import cut_lineage

    # the sketch fans out into three references (a, b, thetas);
    # materialize it once so the build's distinct + window never
    # recompute — keeping the docstring's "nothing downstream of the
    # sketch build ever rescans the corpus" literally true.
    sk = cut_lineage(kmv_build(items, set_col, item_col, k), eager=True)
    a = sk.select(
        F.col(set_col).alias("set_a"), "h",
        F.col("theta_h").alias("_tha"),
    )
    b = sk.select(
        F.col(set_col).alias("set_b"), "h",
        F.col("theta_h").alias("_thb"),
    )
    thetas = (
        sk.select(set_col, "theta_h")
        .distinct()
    )
    ta = thetas.select(
        F.col(set_col).alias("set_a"), F.col("theta_h").alias("tha")
    )
    tb = thetas.select(
        F.col(set_col).alias("set_b"), F.col("theta_h").alias("thb")
    )
    pairs = (
        ta.join(tb, F.col("set_a") < F.col("set_b"))
        .select(
            "set_a", "set_b",
            F.least("tha", "thb").alias("theta"),
        )
    )
    common = (
        a.join(b, "h")
        .filter(F.col("set_a") < F.col("set_b"))
        .join(pairs, ["set_a", "set_b"])
        .filter(F.col("h") < F.col("theta"))
        .groupBy("set_a", "set_b", "theta")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        pairs.join(common.select("set_a", "set_b", "n_common"),
                   ["set_a", "set_b"], "left")
        .select(
            "set_a", "set_b",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.round(
                F.coalesce("n_common", F.lit(0))
                * F.lit(_KMV_SPACE)
                / F.col("theta").cast("double"),
                4,
            ).alias("est_common"),
        )
    )
