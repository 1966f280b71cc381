"""map_reduce_subnet_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine providing the query and data-processing
capabilities of the reference map-reduce-subnet (see SURVEY.md): chunked
broadcast / keyed-sum map-reduce semantics re-expressed as Catalyst-
optimized DataFrame plans, plus the LLM-data-pipeline extensions
(dedup, similarity search, multimodal columns, text analysis).

Public surface:
    - :func:`map_reduce_subnet_spark.session.get_spark`
    - :func:`map_reduce_subnet_spark.sources.tables.load_table`
    - :mod:`map_reduce_subnet_spark.operators` — the query registry
      (``QUERIES`` name -> (spark, sf_dir) -> DataFrame, ``ORACLES``
      name -> DuckDB-compatible ANSI SQL).
"""

__version__ = "0.1.0"
