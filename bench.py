#!/usr/bin/env python
"""Benchmark harness: runs the registered headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query time = full plan execution into the no-op sink: every output
column is materialized (a bare count() would let Catalyst prune the
projection expressions, timing map-only queries as empty scans) but no
rows cross to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_subnet_spark.operators import QUERIES  # noqa: E402
from map_reduce_subnet_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="mrs-bench")

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not session startup.
    QUERIES["agg_reduce_sum"](spark, sf_dir).count()

    times: dict[str, float] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 4)
        except Exception as ex:  # keep benching even if one query breaks
            times[name] = -1.0
            print(f"bench: {name} FAILED: {ex}", file=sys.stderr)

    total = round(sum(t for t in times.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
