"""URL canonicalization, URL-level dedup, and per-domain quotas — the
RefinedWeb/CCNet web-curation front door (Penedo et al. 2023 §3.1 "URL
filtering" + the standard crawl convention: canonicalize before
deduplicating, cap per-registered-domain contribution so a single site
cannot dominate the corpus).

The documents fixture carries no URL column, so :func:`synth_urls`
derives one deterministically from (doc_id, source) — the same
convention the geo operators use to derive lat/lon from keys — with
every mess the canonicalizer must handle: mixed-case schemes/hosts,
``www.`` prefixes, default ports, trailing slashes, tracking query
parameters in scrambled order, fragments.

Everything is JVM column algebra (regexp/split/filter/sort/concat) over
one scan — no UDF, no shuffle before the dedup group-by itself — and
every step is replayed verbatim by the DuckDB oracle.

Reference parity: the reference's bulk-load pipeline normalizes element
identifiers before dedup-on-ingest (titan-core
graphdb/database/StandardTitanGraph.java addVertex/uniqueness paths);
URL canonicalization is the corpus-curation analog of that normalize-
then-dedup contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from titan_spark.functions.hashing import portable_hash64

#: query parameters stripped by canonicalization (tracking params — the
#: standard utm_* family plus click identifiers and social ref tags)
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)="


def synth_urls(
    df: DataFrame, id_col: str = "doc_id", source_col: str = "source"
) -> DataFrame:
    """Deterministic messy-URL fixture column. The URL's CONTENT
    (host, section/page path, real query params) derives ONLY from a
    shared page key ``p = doc_id % 211``, so many documents point at
    the same logical page; the MESS (casing, ``www.``, default port,
    trailing slash, tracking params in scrambled order, fragment)
    derives from the doc key itself — documents sharing ``p`` differ
    in every superficial way and must still collide after
    canonicalization. Every canonicalizer branch is exercised and
    both engines build bit-identical inputs. ``source_col`` is kept
    for signature stability; content deliberately avoids it so group
    sizes are corpus-size-proportional at every sf."""
    k = F.col(id_col)
    p = k % 211
    scheme = F.when(k % 5 == 0, F.lit("HTTPS")).otherwise(F.lit("https"))
    www = F.when(k % 4 == 0, F.lit("www.")).otherwise(F.lit(""))
    site = F.concat(
        F.when(k % 5 == 0, F.lit("Site")).otherwise(F.lit("site")),
        (p % 23).cast("string"),
        F.lit(".example."),
        F.element_at(
            F.array(F.lit("com"), F.lit("org"), F.lit("net")),
            (p % 3).cast("int") + 1,
        ),
    )
    port = F.when(k % 7 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/s"),
        (p % 4).cast("string"),
        F.lit("/page"),
        p.cast("string"),
        F.when(k % 6 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    q_track = F.when(
        k % 2 == 0,
        F.concat(F.lit("utm_source=feed&utm_campaign=c"), (k % 3).cast("string")),
    ).otherwise(F.lit(""))
    q_ref = F.when(k % 3 == 0, F.lit("ref=tw")).otherwise(F.lit(""))
    q_id = F.concat(F.lit("id="), (p % 7).cast("string"))
    q_lang = F.concat(
        F.lit("lang="),
        F.when(p % 2 == 0, F.lit("en")).otherwise(F.lit("de")),
    )
    # scrambled parameter order: half the rows lead with the real
    # params, half with the trackers — canonicalization must sort
    q_all = F.when(
        k % 2 == 0, F.concat_ws("&", q_track, q_id, q_ref, q_lang)
    ).otherwise(F.concat_ws("&", q_lang, q_id, q_ref, q_track))
    query = F.regexp_replace(F.regexp_replace(q_all, "&+", "&"), "^&|&$", "")
    frag = F.when(
        k % 8 == 0, F.concat(F.lit("#p"), (k % 7).cast("string"))
    ).otherwise(F.lit(""))
    url = F.concat(
        scheme, F.lit("://"), www, site, port, path, F.lit("?"), query, frag
    )
    return df.withColumn("url", url)


def canonicalize_url(url):
    """Canonical form of a URL, as a pure JVM column expression:
    lowercase scheme+host, strip ``www.``, strip default ports
    (``:443``/``:80``), strip the fragment, strip trailing path
    slashes (the root path renders empty), drop tracking query
    parameters (``utm_*``, ``gclid``, ``fbclid``, ``ref``) and sort
    the survivors — two URLs differing only in these render the same
    canonical string."""
    u = F.regexp_replace(url, "#.*$", "")  # fragment
    pre = F.regexp_extract(u, r"^([^?]*)", 1)
    rawq = F.when(u.contains("?"), F.regexp_extract(u, r"\?(.*)$", 1)).otherwise(
        F.lit("")
    )
    scheme = F.lower(F.regexp_extract(pre, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(pre, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/]*)", 1))
    host = F.regexp_replace(host, ":(443|80)$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(rest, r"^[^/]*(/.*)?$", 1)
    path = F.regexp_replace(path, "/+$", "")
    kept = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda p: (p != F.lit("")) & ~(p.rlike(TRACKING_PARAM_RE)),
        )
    )
    qcanon = F.concat_ws("&", kept)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup after canonicalization: one row per
    canonical URL with the corpus-first keeper (min id) and the
    duplicate count. Scale shape: ONE map-side-combinable groupBy on
    the canonical string — no text, no pairs, no window; the
    canonical key is what makes near-identical crawl URLs collide at
    all (raw-string dedup misses every tracking-param variant)."""
    c = canonicalize_url(F.col(url_col))
    return (
        df.select(F.col(id_col), c.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keeper_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


def domain_quota(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Per-domain contribution cap (RefinedWeb keeps per-domain
    balance so a single site cannot dominate): canonicalize, take the
    host as the domain, keep at most ``cap`` documents per domain by
    deterministic hash order (uniform within the domain, replayable
    by the oracle — head-of-crawl order would bias toward low ids).
    Returns one row per domain: total docs, kept docs, and the kept
    ids' sum — a value that pins the exact kept SET, not just its
    size. Scale shape: one window rank per domain (same shuffle key
    as the count), kilobytes per domain downstream."""
    from pyspark.sql import Window

    c = canonicalize_url(F.col(url_col))
    host = F.regexp_extract(c, r"^[a-z][a-z0-9+.-]*://([^/?]*)", 1)
    pick = portable_hash64(
        F.concat(F.lit(f"dq{seed}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("_pick").asc(), F.col(id_col).asc()
    )
    ranked = df.select(F.col(id_col), host.alias("domain"), pick.alias("_pick"))
    ranked = ranked.withColumn("_rn", F.row_number().over(w))
    return ranked.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("_rn") <= cap).cast("long")).alias("n_kept"),
        F.sum(
            F.when(F.col("_rn") <= cap, F.col(id_col)).otherwise(F.lit(0))
        ).alias("kept_id_sum"),
    )
