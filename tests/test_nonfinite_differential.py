"""Non-finite measure differential: NaN and +Inf in events.value.

A 100 TB value column WILL carry NaN/Inf (sensor glitches, 0/0 in an
upstream job, overflowed floats). Measured facts (r10 scoping sweep,
NOTES):

* Spark casts NaN AND Inf to DECIMAL as NULL even under ANSI, so the
  decimal-stabilized sums (functions/stable.py::dsum) silently DROP
  non-finite observations — the engine behaves consistently.
* DuckDB is asymmetric: CAST(NaN AS DECIMAL) is NULL (matching Spark),
  CAST(inf AS DECIMAL) raises ConversionException — so the sql_dsum
  ORACLE twins of 14 value-consuming keys crash on Inf while their
  engines run fine.

This module pins the 210-key agreement that already holds, so a
regression in the accidental-but-consistent drop-non-finite semantic
fails loudly. The 14 oracle-crash keys are excluded and listed —
making the convention EXPLICIT on both engines (isfinite guard inside
dsum/sql_dsum, all consumers re-swept) is the planned r11 round; when
that lands, NONFINITE_ORACLE_ERR_KEYS should shrink to empty and this
exclusion with it.
"""

from __future__ import annotations

import numpy as np
import pytest

from map_reduce_subnet_spark.operators import ORACLES, QUERIES
from tests.conftest import assert_frames_match
from tests.test_micro_differential import _micro_tables
from tests.test_perturbed_differential import (
    PERTURBED_KEYS,
    PERTURBED_ONLY_KEYS,
)

# Keys whose DuckDB oracle crashes on CAST(inf AS DECIMAL) inside a
# sql_dsum twin (engine side runs fine on all of them) — the r11
# isfinite-guard worklist, measured r10.
NONFINITE_ORACLE_ERR_KEYS = {
    "agg_time_decay",
    "agg_trend_ols",
    "privacy_k_anonymize",
    "scan_jsonl_roundtrip",
    "sessionize_events",
    "sink_compaction",
    "sink_zorder_cluster",
    "stream_sliding",
    "stream_sliding_true",
    "stream_tumbling",
    "timeseries_gapfill",
    "window_moving_avg",
    "window_rolling_quantiles",
    "window_zscore_anomaly",
}

NONFINITE_KEYS = sorted(
    set(PERTURBED_KEYS + PERTURBED_ONLY_KEYS) - NONFINITE_ORACLE_ERR_KEYS
)


def _nonfinite_tables():
    tables = _micro_tables()
    ev = tables["events"].copy()
    # rows 7 and 13 carry no structural role in the micro corpus (the
    # NULL sits at 5, the funnel chain at 10-12)
    ev.loc[7, "value"] = np.nan
    ev.loc[13, "value"] = np.inf
    tables["events"] = ev
    return tables


@pytest.fixture(scope="module")
def nonfinite_dir(tmp_path_factory) -> str:
    dst = tmp_path_factory.mktemp("nonfinite_fixture")
    for name, df in _nonfinite_tables().items():
        df.to_parquet(dst / f"{name}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def nfdb(nonfinite_dir):
    import duckdb

    con = duckdb.connect()
    for name in _nonfinite_tables():
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{nonfinite_dir}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", NONFINITE_KEYS)
def test_nonfinite_differential(spark, nonfinite_dir, nfdb, key):
    got = QUERIES[key](spark, nonfinite_dir).toPandas()
    want = nfdb.sql(ORACLES[key]).df()
    assert_frames_match(got, want, f"nonfinite:{key}")


@pytest.mark.parametrize("key", sorted(NONFINITE_ORACLE_ERR_KEYS))
def test_nonfinite_excluded_keys_engine_still_runs(
    spark, nonfinite_dir, key
):
    """The exclusions are ORACLE-side only: every excluded key's
    ENGINE must still run on the non-finite corpus (Spark's
    NaN/Inf→NULL decimal cast absorbs the hazard). If one ever starts
    throwing, that is a new engine-side regression, not an oracle
    gap."""
    got = QUERIES[key](spark, nonfinite_dir).toPandas()
    assert got is not None
