"""mapreduce_hadoop_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference project ``miloshdrago/mapreduce-hadoop``
(KU Leuven "Big Data Analytics Programming", Assignment 3): a taxi-GPS
trip-length histogram, GPS-segment cleansing, stateful trip sessionization,
and daily/total revenue aggregation — plus the large-scale training-data
pipeline operators a 100 TB deployment needs (exact + near dedup, similarity
search, text analysis, multimodal column plumbing).

Design stance (see SURVEY.md §7):
- DataFrame/SQL only; no RDDs. Catalyst + AQE do the physical planning.
- Explicit StructType schemas; UTC session timezone.
- Built-in ``pyspark.sql.functions`` expressions everywhere; the single
  order-dependent kernel (trip sessionization with speed-drops,
  reference ``src/AirportTripsRevenue.java:275-407``) has a scalable
  window-function formulation as the default and an ``applyInPandas``
  state-machine replay behind a parity flag.
"""

__version__ = "0.1.0"
