"""Comparison / containment predicate algebra.

Reproduces Titan's predicate semantics (reference
``titan-core/.../core/attribute/Cmp.java``,
``core/attribute/Contain.java``, QNF rewrite
``graphdb/query/QueryUtil.java:162-213``) as Column builders:

- ``EQUAL(null)`` means "key absent"  → ``isNull``
  (Cmp.java:16-52; has(k, null) matches missing key,
  TitanGraphTest.java:2620,2660).
- ``NOT_EQUAL(null)`` means "key present" → ``isNotNull``.
- ``NOT_EQUAL(v)`` requires the key to be present AND differ — Spark's
  3-valued ``!=`` already drops NULL rows in a filter, which matches.
- ``Contain.NOT_IN`` rewrites to And-of-NOT_EQUAL (QueryUtil.java:
  188-208), hence also implies "key present".
- ``interval(s, e)`` is the half-open ``s <= v < e``
  (core/BaseVertexQuery.java:130-139).

And/Or/Not trees (graphdb/query/condition/) are plain ``&``/``|``/``~``
on Columns; Catalyst's BooleanSimplification is the QNF normalizer.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Pred:
    """A deferred predicate: applied to a Column, yields a boolean Column."""

    name: str
    fn: Callable[[Column], Column]

    def __call__(self, col: Column) -> Column:
        return self.fn(col)


class P:
    """Gremlin/Titan-style predicate factory: ``has("time", P.gt(5))``."""

    @staticmethod
    def eq(value: Any) -> Pred:
        if value is None:
            return Pred("eq(null)", lambda c: c.isNull())
        return Pred(f"eq({value!r})", lambda c: c == F.lit(value))

    @staticmethod
    def neq(value: Any) -> Pred:
        if value is None:
            return Pred("neq(null)", lambda c: c.isNotNull())
        return Pred(f"neq({value!r})", lambda c: c != F.lit(value))

    @staticmethod
    def lt(value: Any) -> Pred:
        return Pred(f"lt({value!r})", lambda c: c < F.lit(value))

    @staticmethod
    def lte(value: Any) -> Pred:
        return Pred(f"lte({value!r})", lambda c: c <= F.lit(value))

    @staticmethod
    def gt(value: Any) -> Pred:
        return Pred(f"gt({value!r})", lambda c: c > F.lit(value))

    @staticmethod
    def gte(value: Any) -> Pred:
        return Pred(f"gte({value!r})", lambda c: c >= F.lit(value))

    @staticmethod
    def between(start: Any, end: Any) -> Pred:
        """Titan ``interval``: half-open [start, end)."""
        return Pred(
            f"between({start!r},{end!r})",
            lambda c: (c >= F.lit(start)) & (c < F.lit(end)),
        )

    # alias matching Titan's API name
    interval = between

    @staticmethod
    def within(*values: Any) -> Pred:
        """Contain.IN — membership (Or-of-EQUAL under QNF)."""
        vals = _flatten(values)
        return Pred(f"within({vals!r})", lambda c: c.isin(vals))

    @staticmethod
    def without(*values: Any) -> Pred:
        """Contain.NOT_IN — And-of-NOT_EQUAL, implies key present."""
        vals = _flatten(values)
        return Pred(f"without({vals!r})", lambda c: c.isNotNull() & ~c.isin(vals))

    @staticmethod
    def inside(lo: Any, hi: Any) -> Pred:
        """Gremlin inside: lo < v < hi (exclusive both ends)."""
        return Pred(f"inside({lo!r},{hi!r})", lambda c: (c > F.lit(lo)) & (c < F.lit(hi)))

    @staticmethod
    def outside(lo: Any, hi: Any) -> Pred:
        return Pred(f"outside({lo!r},{hi!r})", lambda c: (c < F.lit(lo)) | (c > F.lit(hi)))

    @staticmethod
    def custom(name: str, fn: Callable[[Column], Column]) -> Pred:
        """Custom TitanPredicate analog (graphdb/query/TitanPredicate.java):
        any Column->Column boolean function plugs into has()."""
        return Pred(name, fn)

    # -- Text predicates as Pred factories (core/attribute/Text.java) so
    # they compose with has(): has("name", P.text_contains("herc")).
    # Names match Text.java's enum for the Mapping legality shim.
    @staticmethod
    def text_contains(query: str) -> Pred:
        from titan_spark.functions.text import text_contains

        return Pred(f"textContains({query!r})", lambda c: text_contains(c, query))

    @staticmethod
    def text_contains_prefix(prefix: str) -> Pred:
        from titan_spark.functions.text import text_contains_prefix

        return Pred(
            f"textContainsPrefix({prefix!r})", lambda c: text_contains_prefix(c, prefix)
        )

    @staticmethod
    def text_contains_regex(pattern: str) -> Pred:
        from titan_spark.functions.text import text_contains_regex

        return Pred(
            f"textContainsRegex({pattern!r})", lambda c: text_contains_regex(c, pattern)
        )

    @staticmethod
    def text_prefix(prefix: str) -> Pred:
        from titan_spark.functions.text import text_prefix

        return Pred(f"textPrefix({prefix!r})", lambda c: text_prefix(c, prefix))

    @staticmethod
    def text_regex(pattern: str) -> Pred:
        from titan_spark.functions.text import text_regex

        return Pred(f"textRegex({pattern!r})", lambda c: text_regex(c, pattern))


def _flatten(values: tuple) -> list:
    if len(values) == 1 and isinstance(values[0], (list, tuple, set)):
        return list(values[0])
    return list(values)


def as_pred(value: Any) -> Pred:
    """Coerce a raw value (meaning EQUAL) or Pred into a Pred."""
    if isinstance(value, Pred):
        return value
    return P.eq(value)
