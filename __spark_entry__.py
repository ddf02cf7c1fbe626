"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query at sf0.001; ``queries`` /
``oracle_sql`` expose the full catalog (one entry per implemented
operator from SURVEY.md §2, each with a DuckDB oracle mirror — see
tcga_query_project_spark/catalog.py for the determinism conventions that
make the value hashes match).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tcga_query_project_spark.catalog import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
    }
