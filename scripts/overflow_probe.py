"""Extreme-magnitude differential probe (r12 scoping run for r13).

Builds the micro corpus with events.value / lineitem prices pushed to
1e18 / 1e20 / 1e22 / 1e300 magnitudes and runs every differential-
family key on Spark vs DuckDB, classifying outcomes into
match / mismatch / spark_err / duck_err / both_err. READ-ONLY: no
oracle or engine change — the r12 measured facts live in NOTES.md
("EXTREME-MAGNITUDE PROBE"). The r13 out-of-domain round promoted
this corpus to permanent suite layer 15
(tests/test_extreme_magnitude_differential.py, which pins the
classification per key); keep this script as the exploratory harness
— its output is the source of truth when re-syncing the layer's
EXTREME_ABORT_KEYS list. r14 closing state: match 206, spark_err 0,
duck_err 0, both_err 20 (symmetric band-edge refusals, the decided
posture), mismatch 0 (the 7 unguarded-dsum keys that drifted at 1e20
in r13 were ported to stable.py::dsum_wide, emptying the drift class
— layer 15 no longer carries a pinned-drift escape hatch).

Usage:  cd /tmp && python /root/repo/scripts/overflow_probe.py
"""
import sys, traceback
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')
import numpy as np, pandas as pd, duckdb
from tests.test_micro_differential import _micro_tables
from tests.test_perturbed_differential import PERTURBED_KEYS, PERTURBED_ONLY_KEYS
from tests.conftest import assert_frames_match
from map_reduce_subnet_spark.operators import ORACLES, QUERIES
from pyspark.sql import SparkSession

tables = _micro_tables()
ev = tables["events"].copy()
mags = [1e18, -1e18, 1e20, -1e20, 1e22, 1e300]
# .loc on a too-small frame silently APPENDS half-NaN rows instead of
# planting (ADVICE r12): assert the labels exist
assert len(ev) > 3 * (len(mags) - 1), "micro events table shrank"
for i, m in enumerate(mags):
    ev.loc[3*i, "value"] = m
tables["events"] = ev
li = tables["lineitem"].copy()
assert len(li) >= 2, "micro lineitem table shrank"
li.loc[0, "l_extendedprice"] = 1e20
li.loc[1, "l_quantity"] = 1e19
tables["lineitem"] = li

import tempfile, os
dst = tempfile.mkdtemp(prefix="ovf_")
for name, df in tables.items():
    df.to_parquet(os.path.join(dst, f"{name}.parquet"))

con = duckdb.connect()
for name in tables:
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{dst}/{name}.parquet'")

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

keys = sorted(set(PERTURBED_KEYS + PERTURBED_ONLY_KEYS))
res = {"match": [], "mismatch": [], "spark_err": [], "duck_err": [], "both_err": []}
for key in keys:
    if key not in ORACLES:
        continue
    serr = derr = None
    got = want = None
    try:
        got = QUERIES[key](spark, dst).toPandas()
    except Exception as e:
        serr = f"{type(e).__name__}: {str(e)[:120]}"
    try:
        want = con.sql(ORACLES[key]).df()
    except Exception as e:
        derr = f"{type(e).__name__}: {str(e)[:160]}"
    if serr and derr:
        res["both_err"].append((key, serr[:60], derr[:60]))
    elif serr:
        res["spark_err"].append((key, serr))
    elif derr:
        res["duck_err"].append((key, derr))
    else:
        try:
            assert_frames_match(got, want, key)
            res["match"].append(key)
        except Exception as e:
            res["mismatch"].append((key, str(e)[:200]))

print("=== OVERFLOW PROBE RESULTS ===")
print("match:", len(res["match"]))
for cat in ("mismatch", "spark_err", "duck_err", "both_err"):
    print(f"{cat}: {len(res[cat])}")
    for row in res[cat]:
        print("   ", row)
