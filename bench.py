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
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # The driver captures only a bounded tail of stdout: a single JSON
    # line with all ~100 per-query timings (~4.4 KB) was truncated
    # mid-dict in round 1 and never parsed. Keep the LAST stdout line a
    # compact summary (<1 KB) and put the per-query detail in a file
    # (plus stderr, for ad-hoc runs that only keep the console).
    detail = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(json.dumps(detail["queries"]), file=sys.stderr)
    n_failed = sum(1 for t in times.values() if t < 0)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(times),
                "n_failed": n_failed,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
