"""Spark-side function surface.

- ``columns``: native Column expression builders (whole-stage codegen; no
  Python on the hot path) plus mirrored DuckDB-SQL generators used by the
  correctness oracle.
- ``udfs``: vectorized pandas/Arrow UDFs wrapping the numpy kernels for
  the operations Spark's built-ins cannot express (ray-cast PIP, geohash
  decode, Vincenty).
"""
