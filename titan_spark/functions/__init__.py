"""Column-expression library: comparison/containment predicates, the
tokenized text predicates, and geo predicates.

Everything here returns pyspark Column expressions (JVM-side,
whole-stage-codegen'd) — no Python UDFs — so predicates stay inside
Catalyst and push down to the parquet scan.
"""

from titan_spark.functions.geo import geo_disjoint, geo_within_box, geo_within_circle, haversine_km
from titan_spark.functions.predicates import P, Pred
from titan_spark.functions.text import (
    text_contains,
    text_contains_prefix,
    text_contains_regex,
    text_prefix,
    text_regex,
    tokenize,
)

__all__ = [
    "P",
    "Pred",
    "tokenize",
    "text_contains",
    "text_contains_prefix",
    "text_contains_regex",
    "text_prefix",
    "text_regex",
    "haversine_km",
    "geo_within_circle",
    "geo_within_box",
    "geo_disjoint",
]
