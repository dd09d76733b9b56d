"""Tokenized full-text predicates (Titan's mixed-index text surface).

Tokenization contract from the reference
(``titan-core/.../core/attribute/Text.java:38-58``): lowercase the
string, split on non-alphanumeric characters, drop empties, match
whole tokens. ``CONTAINS`` with a multi-word query requires ALL query
tokens to appear (Text.java:27-58; docs/searchpredicates.txt:24-27).

All expressions are built-in higher-order array functions — they stay
JVM-side inside whole-stage codegen (no Python UDF), so a text filter
over 100 TB is a plain scan+filter with column pruning.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Titan tokenizes on Character.isLetterOrDigit; for the ASCII corpus the
# [^a-z0-9]+ split after lowercasing is the same contract.
_TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(col: Column | str) -> Column:
    """Lowercase + split on non-alphanumeric + drop empty tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), _TOKEN_SPLIT), lambda t: t != F.lit(""))


def _query_tokens(query: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", query.lower()) if t]


def text_contains(col: Column | str, query: str) -> Column:
    """Text.CONTAINS: every token of `query` appears as a token of col.

    Expressed as one ``array_intersect`` so the column tokenizes once
    per row — a conjunction of ``array_contains`` re-evaluates the
    tokenizer per query token (expression inlining).
    """
    toks = sorted(set(_query_tokens(query)))
    if not toks:
        return F.lit(False)
    if len(toks) == 1:
        return F.array_contains(tokenize(col), toks[0])
    qarr = F.array(*[F.lit(t) for t in toks])
    return F.size(F.array_intersect(tokenize(col), qarr)) == len(toks)


def text_contains_prefix(col: Column | str, prefix: str) -> Column:
    """Text.CONTAINS_PREFIX: some token starts with lowercase(prefix)."""
    p = prefix.lower()
    return F.exists(tokenize(col), lambda t: t.startswith(p))


def text_contains_regex(col: Column | str, pattern: str) -> Column:
    """Text.CONTAINS_REGEX: some token fully matches the regex."""
    return F.exists(tokenize(col), lambda t: t.rlike(f"^(?:{pattern})$"))


def text_prefix(col: Column | str, prefix: str) -> Column:
    """Text.PREFIX: whole-string startsWith, case-sensitive (Text.java:112-133)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.startswith(prefix)


def text_regex(col: Column | str, pattern: str) -> Column:
    """Text.REGEX: whole string matches the regex entirely (Text.java:135-158)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(f"^(?:{pattern})$")
