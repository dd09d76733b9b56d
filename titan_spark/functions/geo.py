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
