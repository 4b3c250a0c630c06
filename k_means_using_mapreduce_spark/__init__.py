"""PySpark-native analytics engine with the capabilities of
manav-saini/K-Means_using_MapReduce (reference at /root/reference, read-only).

The reference is a hand-rolled MapReduce-over-gRPC K-Means system
(master.py / mapper.py / reducer.py). This package re-expresses every
operator in its inventory (SURVEY.md §2, O1-O25) Spark-first:
DataFrame/SQL declarative plans optimized by Catalyst, broadcast joins
for the small centroid relation, hash aggregation with map-side partial
combine for the centroid update, and Spark's own shuffle/fault-tolerance
replacing the reference's gRPC partition files and retry loops.

Layout
------
- ``session``    : SparkSession factory tuned for local[N] testing and
                   cluster-scale defaults (AQE, Arrow, shuffle partitions).
- ``sources``    : loaders (parquet test tables, reference-style points CSV)
                   and sinks (O1, O2, O3, O16, O25).
- ``functions``  : scalar/array expression builders — distances (O9),
                   text analysis, md5-based hashing for dedup.
- ``operators``  : the dataflow operators — kmeans kernels (O7-O9,
                   O13-O15), the iterative fit loop (O4, O17-O19), the
                   MLlib fast path, dedup, similarity search, multimodal.
- ``streaming``  : Structured Streaming versions (streaming assignment,
                   windowed cluster stats).
- ``plans``      : plan-inspection helpers used by tests to assert
                   pushdown / broadcast / codegen properties.
"""

__version__ = "0.1.0"
