"""Physical-plan assertions — the 100 TB posture, checked mechanically.

The correctness harness proves the values; these tests prove the plans
are the ones that survive scale: filters reach the parquet scan, scans
prune columns, dim joins broadcast, candidate generation never degrades
to a cartesian product, and hot paths stay inside whole-stage codegen.
"""

from __future__ import annotations

import pytest

from map_reduce_subnet_spark.operators import QUERIES
from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "scan_filter_pushdown")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual" in plan


def test_column_pruning_reaches_scan(spark):
    plan = plan_of(spark, "scan_prune_columns")
    # ReadSchema must contain only the two projected columns
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read and "l_shipdate" not in read


def test_dim_joins_are_broadcast(spark):
    plan = plan_of(spark, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    # the fact side must not appear under a shuffle exchange before the join
    assert plan.count("BroadcastHashJoin") >= 3


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "join_multiway_star")
    assert "BroadcastHashJoin" in plan


def test_flagship_has_partial_aggregation(spark):
    plan = plan_of(spark, "agg_reduce_sum")
    # partial + final HashAggregate = map-side combine (the factor-K win)
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2
    # exactly one shuffle: the agg exchange; decimal casts must not
    # have broken partial aggregation
    n_exchanges = sum(
        1
        for ln in plan.splitlines()
        if ln.startswith("(") and "Exchange" in ln
    )
    assert n_exchanges == 1


def test_no_cartesian_in_candidate_generation(spark):
    for name in ("dedup_near_minhash", "dedup_ngram_jaccard"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, f"{name} degraded to cartesian"


def test_topk_uses_take_ordered(spark):
    plan = plan_of(spark, "limit_topk")
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize(
    "name", ["project_arith", "filter_compound", "agg_reduce_sum", "text_quality"]
)
def test_hot_paths_have_no_python(spark, name):
    """Hot-path queries must stay JVM-side: no row-at-a-time Python
    eval, no Arrow eval — only built-in expressions (codegen-able)."""
    plan = plan_of(spark, name)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_udf_paths_are_arrow_not_row(spark):
    """Where Python IS used (family J), it must be Arrow-vectorized."""
    plan = plan_of(spark, "udf_scalar")
    assert "ArrowEvalPython" in plan or "BatchEvalPython" not in plan
