"""Geo predicates (Titan's Geoshape surface: point / circle / box).

Reference: ``titan-core/.../core/attribute/Geo.java:18-110`` and
``Geoshape.java:244-290``. Distances use spatial4j geodesics with
``DistanceUtils.EARTH_MEAN_RADIUS_KM`` (Geoshape.java:230) — the same
Earth-radius constant is used here so results hash-match an oracle
using the identical formula.

Implemented as built-in trig Column expressions (JVM-side): a geo
filter is a plain scan predicate, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# spatial4j DistanceUtils.EARTH_MEAN_RADIUS_KM
EARTH_MEAN_RADIUS_KM = 6371.0087714


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def haversine_km(
    lat1: Column | str, lon1: Column | str, lat2: Column | float, lon2: Column | float
) -> Column:
    """Great-circle distance in km (haversine on the mean-radius sphere)."""
    la1, lo1 = F.radians(_c(lat1)), F.radians(_c(lon1))
    la2 = F.radians(F.lit(lat2) if isinstance(lat2, (int, float)) else lat2)
    lo2 = F.radians(F.lit(lon2) if isinstance(lon2, (int, float)) else lon2)
    dlat = la2 - la1
    dlon = lo2 - lo1
    a = F.sin(dlat / 2) ** 2 + F.cos(la1) * F.cos(la2) * F.sin(dlon / 2) ** 2
    return F.lit(2 * EARTH_MEAN_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_within_circle(
    lat: Column | str, lon: Column | str, center_lat: float, center_lon: float, radius_km: float
) -> Column:
    """Geo.WITHIN for a circle: point-in-circle membership (the indexed case)."""
    return haversine_km(lat, lon, center_lat, center_lon) <= F.lit(radius_km)


def geo_within_box(
    lat: Column | str,
    lon: Column | str,
    min_lat: float,
    min_lon: float,
    max_lat: float,
    max_lon: float,
) -> Column:
    """Geo.WITHIN for a box: lat/lon between the corners."""
    return (
        (_c(lat) >= F.lit(min_lat))
        & (_c(lat) <= F.lit(max_lat))
        & (_c(lon) >= F.lit(min_lon))
        & (_c(lon) <= F.lit(max_lon))
    )


def geo_disjoint(*args, **kwargs) -> Column:
    """Geo.DISJOINT = NOT intersect; for point-vs-circle/box this is ~within."""
    return ~geo_within_circle(*args, **kwargs)


# -------------------------------------------------- shape-vs-shape INTERSECT
# Geo.java:18-72 defines INTERSECT over the full geometry lattice
# (point/circle/box vs point/circle/box); the point-vs-region cases are
# the within/disjoint predicates above. The shape-vs-shape cases below
# complete the predicate surface; all remain plain Column algebra
# (codegen'd trig + comparisons — still just scan predicates).


def circles_intersect(
    lat1: Column | str,
    lon1: Column | str,
    r1_km: Column | float,
    lat2: Column | float,
    lon2: Column | float,
    r2_km: Column | float,
) -> Column:
    """Circle-circle Geo.INTERSECT: great-circle distance between the
    centers ≤ r1 + r2 (Geoshape.java circle relations on the mean-radius
    sphere)."""
    r1 = F.lit(r1_km) if isinstance(r1_km, (int, float)) else r1_km
    r2 = F.lit(r2_km) if isinstance(r2_km, (int, float)) else r2_km
    return haversine_km(lat1, lon1, lat2, lon2) <= r1 + r2


def boxes_intersect(
    min_lat1: Column | str,
    min_lon1: Column | str,
    max_lat1: Column | str,
    max_lon1: Column | str,
    min_lat2: Column | float,
    min_lon2: Column | float,
    max_lat2: Column | float,
    max_lon2: Column | float,
) -> Column:
    """Box-box Geo.INTERSECT: closed-interval overlap on both axes."""

    def lit(x):
        return F.lit(x) if isinstance(x, (int, float)) else _c(x)

    return (
        (_c(min_lat1) <= lit(max_lat2))
        & (_c(max_lat1) >= lit(min_lat2))
        & (_c(min_lon1) <= lit(max_lon2))
        & (_c(max_lon1) >= lit(min_lon2))
    )


def circle_box_intersect(
    clat: Column | str,
    clon: Column | str,
    radius_km: Column | float,
    min_lat: Column | float,
    min_lon: Column | float,
    max_lat: Column | float,
    max_lon: Column | float,
) -> Column:
    """Circle-box Geo.INTERSECT: clamp the circle's center to the box
    (the box's nearest point) and test that point against the radius —
    the standard rect-circle relation, here on the haversine sphere."""

    def lit(x):
        return F.lit(x) if isinstance(x, (int, float)) else _c(x)

    r = F.lit(radius_km) if isinstance(radius_km, (int, float)) else radius_km
    near_lat = F.greatest(lit(min_lat), F.least(lit(max_lat), _c(clat)))
    near_lon = F.greatest(lit(min_lon), F.least(lit(max_lon), _c(clon)))
    return haversine_km(clat, clon, near_lat, near_lon) <= r
