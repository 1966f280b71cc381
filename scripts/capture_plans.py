#!/usr/bin/env python
"""Capture `.explain('formatted')` for named queries into plans/<dir>/.

Usage:
    python scripts/capture_plans.py <out_subdir> <suffix> name1 name2 ...

Writes plans/<out_subdir>/<name>_<suffix>.txt for each query, built on
the engine's own session factory at sf0.1 (the bench's fixture), via
map_reduce_subnet_spark.plans.inspect.formatted_plan — the same helper
the plan lints use, so the captured text is exactly what the lints
assert on. Capture only plans (no execution) — cache builders may
still run jobs when their artifact is cold.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_subnet_spark.operators import QUERIES  # noqa: E402
from map_reduce_subnet_spark.plans.inspect import formatted_plan  # noqa: E402
from map_reduce_subnet_spark.session import get_spark  # noqa: E402

out_dir, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.makedirs(os.path.join("plans", out_dir), exist_ok=True)
spark = get_spark(app_name="mrs-plan-capture")
for name in names:
    df = QUERIES[name](spark, sf_dir)
    path = os.path.join("plans", out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(formatted_plan(df))
    print("wrote", path)
