"""Geospatial scalar functions as pure Column expressions.

Mirrors the reference's math exactly (same operation order, same constants) so
results are bit-compatible:

- ``spherical_earth_distance`` — flat-projection spherical-Earth distance,
  *not* haversine (``src/SparkTripLength.java:22-27``,
  ``src/AirportTripsRevenue.java:65-70``).
- ``is_valid_position`` — bounding box + east-of-coastline half-plane test
  (``src/AirportTripsRevenue.java:90-104``).
- ``is_airport_position`` — within-radius predicate
  (``src/AirportTripsRevenue.java:79-81``).

All are built-in-function compositions: they run JVM-side inside whole-stage
codegen, no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mapreduce_hadoop_spark import constants as C


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def spherical_earth_distance(
    lat1: Column | str,
    lon1: Column | str,
    lat2: Column | str,
    lon2: Column | str,
) -> Column:
    """Distance in km between two (degree) points, plane-projection formula.

    ``R * sqrt(dLat^2 + (cos(meanLat) * dLon)^2)`` with dLat/dLon/meanLat in
    radians — exact operation order of ``SparkTripLength.java:22-27``.
    """
    lat1, lon1, lat2, lon2 = map(_col, (lat1, lon1, lat2, lon2))
    d2r = F.lit(C.DEGREES_TO_RADIANS)
    delta_lat = (lat1 - lat2) * d2r
    delta_lon = (lon1 - lon2) * d2r
    mean_lat = (lat1 + lat2) * d2r / F.lit(2)
    return F.lit(C.EARTH_RADIUS_KM) * F.sqrt(
        F.pow(delta_lat, F.lit(2)) + F.pow(F.cos(mean_lat) * delta_lon, F.lit(2))
    )


def is_valid_position(lat: Column | str, lon: Column | str) -> Column:
    """True when the point is inside the bounding box and east of the coastline.

    Reference semantics (``AirportTripsRevenue.java:90-104``): invalid when
    ``lat < a*lon + b`` (in the sea), or lat/lon outside
    [36.50, 39.80] x [-123.80, -119.10].
    """
    lat, lon = _col(lat), _col(lon)
    east_of_coast = lat >= (F.lit(C.COASTLINE_EQ_PARAM_A) * lon + F.lit(C.COASTLINE_EQ_PARAM_B))
    in_lat = (lat >= F.lit(C.MIN_LAT)) & (lat <= F.lit(C.MAX_LAT))
    in_lon = (lon >= F.lit(C.MIN_LONG)) & (lon <= F.lit(C.MAX_LONG))
    return east_of_coast & in_lat & in_lon


def is_airport_position(
    lat: Column | str,
    lon: Column | str,
    airport_lat: float = C.SFO_LAT,
    airport_lon: float = C.SFO_LONG,
    radius_km: float = C.SFO_MAX_DISTANCE_KM,
) -> Column:
    """True when the point is within ``radius_km`` of the airport center.

    Reference: ``AirportTripsRevenue.java:79-81`` (SFO, 1.0 km). The center
    and radius are parameters here — the engine treats them as query
    constants, not hard-coded physics.
    """
    return (
        spherical_earth_distance(lat, lon, F.lit(airport_lat), F.lit(airport_lon))
        <= F.lit(radius_km)
    )
