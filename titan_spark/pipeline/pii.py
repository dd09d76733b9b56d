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


def secrets_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 20,
    entropy_bits: float = 3.5,
) -> DataFrame:
    """High-entropy credential detection — the Dolma / BigCode-style
    secrets pass that PII regexes cannot express: API keys, tokens and
    key material are format-free, but they are long runs of
    base64-alphabet characters whose per-character Shannon entropy is
    far above natural language (~4.x bits vs ~2-3 for English words,
    ~0-1 for repeated filler). A doc is flagged when any candidate run
    (≥ ``min_len`` chars of [A-Za-z0-9+/=_-]) has entropy ≥
    ``entropy_bits``.

    Returns (id, n_candidates, n_high_entropy, max_entropy ROUND 4,
    has_secret).

    Scale shape: a pure narrow map — ``regexp_extract_all`` (JVM,
    codegen) pulls the candidate runs, and the entropy of each is
    computed with array built-ins over the run's own characters
    (O(len²) per candidate with len ≤ a few hundred — bounded,
    in-row, no Python, no shuffle at all before the final per-doc
    projection). The entropy is accumulated PER POSITION in string
    order — H = Σ_i (1/n)·(−log2(cnt(cᵢ)/n)), algebraically the same
    −Σ_c p log₂ p but with a deterministic left-to-right float
    addition order that both engines share (a distinct-char sum would
    depend on each engine's dedup order, and float addition does not
    commute at the last ulp), so the oracle replays the value within
    the ROUND 4 edge.
    """
    cand = F.regexp_extract_all(
        F.col(text_col), F.lit(r"[A-Za-z0-9+/=_-]{%d,}" % int(min_len)), 0
    )

    def _entropy(tok):
        # cnt(c) = len − len(replace(tok, c, '')) — O(len) per position
        # without materializing a char array in the lambda (which Spark
        # would re-evaluate per element)
        chars = F.transform(
            F.sequence(F.lit(1), F.length(tok)),
            lambda i: tok.substr(i, F.lit(1)),
        )
        n = F.length(tok).cast("double")
        return F.aggregate(
            chars,
            F.lit(0.0),
            lambda acc, c: acc
            - F.log2(
                (
                    F.length(tok) - F.length(F.replace(tok, c, F.lit("")))
                ).cast("double")
                / n
            )
            / n,
        )

    ents = F.transform(cand, _entropy)
    hi = F.filter(ents, lambda e: e >= F.lit(float(entropy_bits)))
    return df.select(
        F.col(id_col),
        F.size(cand).cast("long").alias("n_candidates"),
        F.size(hi).cast("long").alias("n_high_entropy"),
        F.round(
            F.coalesce(F.array_max(ents), F.lit(0.0)), 4
        ).alias("max_entropy"),
        (F.size(hi) > 0).alias("has_secret"),
    )
