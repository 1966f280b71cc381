"""Operator registry — importing this package registers every query.

``QUERIES``: name -> (spark, sf_dir) -> DataFrame
``ORACLES``: name -> DuckDB-compatible ANSI SQL (differential oracle)
"""

from map_reduce_subnet_spark.operators.registry import ORACLES, QUERIES

from map_reduce_subnet_spark.operators import (  # noqa: F401  (import = register)
    aggregations,
    analytics,
    joins,
    llm,
    projections,
    scalars,
    scans,
    setops,
    sorts,
    streaming_batch,
    udfs,
    warehouse,
    windows,
)
from map_reduce_subnet_spark.streaming import jobs  # noqa: F401,E402  (register)

__all__ = ["QUERIES", "ORACLES"]
