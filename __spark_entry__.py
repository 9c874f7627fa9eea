"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — cell-type (kind) rasterization of the sf0.001
documents table on a res-100 square grid (coords derived deterministically
from doc_id; see seraster_spark.driver_queries).

queries()/oracle_sql(): one entry per implemented operator (SURVEY.md §2 +
training-data ops); every query has an exact DuckDB SQL oracle —
integer-derived inputs keep aggregates bit-deterministic across engines, and
hash-sensitive ops (minhash/simhash/LSH) run md5 / exact-integer-plane
variants here so DuckDB reproduces them bit-for-bit (the faster
xxhash64/gaussian-plane production defaults are pytest-verified).
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
