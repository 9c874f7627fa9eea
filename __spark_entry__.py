"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — cell-type (kind) rasterization of the sf0.001
documents table on a res-100 square grid (coords derived deterministically
from doc_id; see seraster_spark.driver_queries).

queries()/oracle_sql(): one entry per implemented operator (SURVEY.md §2 +
training-data ops); oracles are exact DuckDB SQL — integer-derived inputs
keep every aggregate bit-deterministic across engines. Ops whose results
depend on engine-specific hash functions (xxhash64 minhash/simhash, LSH
buckets) are rows-only here and value-checked by pytest python oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from seraster_spark import driver_queries as DQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return DQ.q_raster_square_kind_sum(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return DQ.queries()


def oracle_sql() -> dict[str, str]:
    return DQ.oracle_sql()
