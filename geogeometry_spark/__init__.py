"""geogeometry_spark — a PySpark-native spatial-join + tiling engine.

From-scratch reimplementation of the computational semantics of the
jillesvangurp/geogeometry Kotlin library (reference vectors cited per
function as file:line), re-architected for Spark:

- ``kernels``   pure numpy kernels (no Spark), bit-for-bit parity with the
                reference algorithms; unit-testable without a JVM.
- ``functions`` Spark Column builders (whole-stage-codegen native math) and
                vectorized pandas/Arrow UDF wrappers around the kernels.
- ``operators`` DataFrame-level operators: PIP broadcast join, kNN via
                cell-ring expansion, radius join, tile assignment,
                geohash-prefix scans, the S2-index join family
                (operators/s2_join.py — engine-extra, north-rule
                "H3/S2"), dedup/similarity/text-analysis ops.
- ``sources``   table loading, deterministic spans synthesis, lineage
                manifests for resumable batch writes.
- ``plans``     end-to-end pipelines (flagship PIP + tiling job) and session
                configuration tuned for large clusters.
"""

__version__ = "0.1.0"
