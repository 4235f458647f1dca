"""Constants mirrored from the reference implementation.

Every value is copied verbatim from
``/root/reference/src/AirportTripsRevenue.java:23-38`` and
``/root/reference/src/SparkTripLength.java:16-17`` so that the new engine is
bit-compatible with the reference's arithmetic.
"""

import math

# Spherical-Earth plane-projection distance (SparkTripLength.java:16-17,
# AirportTripsRevenue.java:23-24).
DEGREES_TO_RADIANS = math.pi / 180.0
EARTH_RADIUS_KM = 6371.009

# SFO airport center + radius (AirportTripsRevenue.java:25-27).
SFO_LAT = 37.62131
SFO_LONG = -122.37896
SFO_MAX_DISTANCE_KM = 1.0

# Geo-validity bounding box (AirportTripsRevenue.java:28-31).
MIN_LAT = 36.50
MAX_LAT = 39.80
MIN_LONG = -123.80
MAX_LONG = -119.10

# Coastline half-plane: a point is in the sea (invalid) when
# lat < a*long + b (AirportTripsRevenue.java:32-33, 90-104).
COASTLINE_EQ_PARAM_A = -1.3388206045302447
COASTLINE_EQ_PARAM_B = -126.75838718367324

# Fare model (AirportTripsRevenue.java:34-35).
START_FEE = 3.5
KM_FEE = 1.71

# Sessionization thresholds (AirportTripsRevenue.java:36-38).
MAX_SEGMENT_SPEED_KMH = 180.0
MAX_SEGMENT_DELTA_TIME_S = 210.0
MIN_TRIP_DISTANCE_KM = 0.100

# Exercise-1 histogram shape (SparkTripLength.java:55-61).
HISTOGRAM_BIN_KM = 2
HISTOGRAM_MAX_KM = 80
