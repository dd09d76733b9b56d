"""PII detection and redaction for document corpora.

Pre-training hygiene: count and scrub personally-identifying strings
(emails, IPv4 addresses, US-style phone numbers) before a corpus ships.
Everything is built-in ``regexp_count``/``regexp_replace`` — JVM-side,
codegen'd, no Python per row — so at 100 TB a redaction pass is a plain
narrow map over the scan with full column pruning (no shuffle at all).

The patterns deliberately use only the portable regex subset (character
classes, bounded repetition — no lookaround, no backreferences) so the
same pattern strings run identically under Java regex (Spark), RE2
(DuckDB), and PCRE: the whole pass is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# portable regex subset: identical semantics in Java regex and RE2
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}

REDACTION_TOKENS = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}

# replacement order matters: phone before ipv4 would let `555-123-4567`
# survive inside a dotted context; redact emails first (they can embed
# digits), then IPs (dotted digits), then phones
_ORDER = ("email", "ipv4", "phone")


def pii_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts: (id, n_email, n_ipv4, n_phone,
    n_pii). The triage pass — rank documents by exposure before
    deciding to redact or drop."""
    c = F.col(text_col)
    counts = {k: F.regexp_count(c, F.lit(p)).cast("int") for k, p in PII_PATTERNS.items()}
    total = None
    for v in counts.values():
        total = v if total is None else total + v
    return df.select(
        F.col(id_col),
        *[v.alias(f"n_{k}") for k, v in counts.items()],
        total.cast("int").alias("n_pii"),
    )


def pii_redact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Replace every PII match with its sentinel token: (id, text).

    A chained ``regexp_replace`` is one codegen'd projection — the
    document body is rewritten in a single pass over the scan, and the
    output column keeps the name of the input so downstream operators
    (dedup, quality, chunking) run on the scrubbed corpus unchanged.
    """
    c = F.col(text_col)
    for k in _ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[k], REDACTION_TOKENS[k])
    return df.select(F.col(id_col), c.alias(text_col))
