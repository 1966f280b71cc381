"""Differential check: run named queries from __spark_entry__ vs DuckDB oracles.

Usage (from a NEUTRAL cwd, e.g. /tmp — driver parity):
    python /root/repo/scripts/diffcheck.py [sf_dir] name1 name2 ...

Defaults to sf0.01; pass an absolute sf_dir as the first arg to
override. Prints MATCH/MISMATCH per query with dtype and first-diff
detail on mismatch; exit code 1 if any mismatch.
"""
import importlib.util
import sys
import time

sf_dir = "/root/testdata/sf0.01"
names = sys.argv[1:]
if names and names[0].startswith("/"):
    sf_dir = names[0]
    names = names[1:]

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
import duckdb  # noqa: E402

con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

qs, osql = m.queries(), m.oracle_sql()
fails = 0
for name in names:
    t0 = time.time()
    sp = qs[name](spark, sf_dir).toPandas()
    dt = time.time() - t0
    if name not in osql:
        print(f"{name}: ROWS-ONLY ran, {len(sp)} rows  [{dt:.2f}s]")
        continue
    du = con.sql(osql[name]).df()
    cols = sorted(sp.columns)
    ok_cols = sorted(du.columns) == cols
    a = sp[cols].sort_values(cols).reset_index(drop=True)
    b = du[cols].sort_values(cols).reset_index(drop=True) if ok_cols else None
    ok = ok_cols and a.equals(b)
    print(
        f"{name}: {'MATCH' if ok else 'MISMATCH'} "
        f"spark={len(sp)} oracle={len(du)} [{dt:.2f}s]"
    )
    if not ok:
        fails += 1
        if not ok_cols:
            print("  spark cols:", cols)
            print("  oracle cols:", sorted(du.columns))
        else:
            neq = ~(a.eq(b) | (a.isna() & b.isna()))
            bad = neq.any(axis=1)
            print("  spark dtypes:", dict(a.dtypes.astype(str)))
            print("  oracle dtypes:", dict(b.dtypes.astype(str)))
            print("  first diffs (spark):")
            print(a[bad].head(5))
            print("  first diffs (oracle):")
            print(b[bad].head(5))
sys.exit(1 if fails else 0)
