#!/usr/bin/env python
"""Benchmark harness: runs the registered headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "sf": ..., ...}

Per-query time = full plan execution into the no-op sink: every output
column is materialized (a bare count() would let Catalyst prune the
projection expressions, timing map-only queries as empty scans) but no
rows cross to the driver.

Timing methodology (round 3, tightened round 7): a warm-up pass
first touches the JVM, the parquet footers AND the Python worker pool
(round 2's single-shot numbers made sub-second queries
noise-dominated: a 0.25 s query landing after a GC-heavy Python-UDF
block read as a 5× "regression" with an unchanged plan). Each query
under REPEAT_UNDER seconds runs twice and records the MIN (the
least-interference estimate on this box); queries above the threshold
are startup/throughput-dominated (live streaming jobs, per-group
Python demos) and record their single run — at ~180 registry queries
the earlier median-of-3 pass pushed wall-clock past 10 minutes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_subnet_spark.operators import QUERIES  # noqa: E402
from map_reduce_subnet_spark.session import get_spark  # noqa: E402

REPEAT_UNDER = 6.0  # sec: first-run times below this get a 2nd run
# (above it: live-streaming/per-group-Python jobs whose single-run
# noise is relatively small and whose repeats would triple a
# minutes-long bench). r7: with the registry at ~180 queries the
# median-of-3 pass pushed bench wall-clock past 10 minutes; sub-
# threshold queries now record MIN-of-2 — on this box's documented
# interference profile the minimum is the least-contaminated
# estimate, and on a quiet machine min-of-2 and median-of-3 agree
# to noise (NOTES.md measurement traps).


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="mrs-bench")

    # Warm-up: JVM + parquet footers (agg_reduce_sum scans lineitem),
    # Python worker pool + Arrow path (udf_scalar), a documents scan
    # (the text family's input), and one throwaway stateful streaming
    # job (stream_stateful_ema) so the streaming engine + state-store
    # + Python state-worker spin-up cost lands here instead of
    # inflating the first timed streaming row (it was the one >2×
    # bench row in round 3, on startup cost alone). A warm-up failure
    # must not lose the whole bench record (the per-query loop
    # tolerates failures; this must too, or one broken query kills
    # the round's BENCH row).
    for warm in (
        "agg_reduce_sum",
        "udf_scalar",
        "text_token_count",
        "stream_stateful_ema",
    ):
        try:
            QUERIES[warm](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:
            print(f"bench: warm-up {warm} FAILED: {ex}", file=sys.stderr)

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    times: dict[str, float] = {}
    n_runs: dict[str, int] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        # Sub-threshold queries run twice and record the MIN: a
        # GC-spiked first sample of a sub-second query must not be
        # recorded as a single-shot "5x regression", and the minimum
        # is the least-interference estimate on this box. Queries
        # whose first run is already over the threshold record that
        # single run (startup/throughput-dominated; a repeat would
        # double a minutes-long bench for little signal). A repeat
        # run that throws after an earlier run succeeded is a
        # transient flake: keep the successful sample(s) (n_runs
        # records how many survived); only 0-successes records a
        # failure.
        runs: list[float] = []
        want = 2
        while len(runs) < want:
            try:
                runs.append(run_once(fn))
            except Exception as ex:
                print(f"bench: {name} run FAILED: {ex}", file=sys.stderr)
                break
            if len(runs) == 1 and runs[0] >= REPEAT_UNDER:
                want = 1
        if not runs:
            times[name] = -1.0
            n_runs[name] = 0
        else:
            times[name] = round(min(runs), 4)
            n_runs[name] = len(runs)

    total = round(sum(t for t in times.values() if t >= 0), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # The driver captures only a bounded tail of stdout: a single JSON
    # line with all ~100 per-query timings (~4.4 KB) was truncated
    # mid-dict in round 1 and never parsed. Keep the LAST stdout line a
    # compact summary (<1 KB) and put the per-query detail in a file
    # (plus stderr, for ad-hoc runs that only keep the console). The
    # detail file lives in a gitignored output dir (env-overridable) —
    # committing a generated artifact churned the diff every rerun.
    detail = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "runs": n_runs,
        "methodology": (
            f"warmed; min-of-2 under {REPEAT_UNDER}s, single run above"
        ),
        "sf": sf_val,
    }
    out_dir = os.environ.get(
        "SPARK_GRAFT_OUT_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "out"),
    )
    os.makedirs(out_dir, exist_ok=True)
    detail_path = os.path.join(out_dir, "BENCH_DETAIL.json")
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
                "detail": detail_path,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
