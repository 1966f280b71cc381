from map_reduce_subnet_spark.plans.inspect import (
    count_exchanges,
    count_operator,
    formatted_plan,
    has_broadcast_join,
    has_cartesian,
    has_partial_aggregation,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "count_exchanges",
    "count_operator",
    "formatted_plan",
    "has_broadcast_join",
    "has_cartesian",
    "has_partial_aggregation",
    "pushed_filters",
    "read_schema_columns",
]
