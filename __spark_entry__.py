"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (extract coordinates from
interleaved span documents -> geohash encode -> broadcast PIP join vs
the Berlin polygon fixtures -> tile assignment) on sf0.001.

``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators; implementations
live in geogeometry_spark.contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from geogeometry_spark.plans.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001", keep_spans=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geogeometry_spark.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from geogeometry_spark.contract import build_oracles

    return build_oracles()
