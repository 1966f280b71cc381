"""Query registry: the engine's declared-query contract.

Every operator the engine supports is registered here as a named query
(SURVEY.md §2.2). A query is a callable ``(spark, sf_dir) -> DataFrame``
building a declarative plan (Catalyst optimizes it); most carry a
DuckDB-compatible ANSI-SQL oracle string used by the differential
correctness harness (the reference's validator-vs-miner oracle pattern,
reference neurons/validator.py:138-141, with DuckDB as the validator).

Queries without an oracle are rows-only checked (non-SQL-expressible or
nondeterministic: approx sketches, hash-dependent MinHash, streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL.

    Column names in the oracle MUST match the Spark result exactly —
    the harness sorts columns by name before value-hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
