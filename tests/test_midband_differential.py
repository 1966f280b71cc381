"""Mid-band magnitude differential: measures at raw ~1e8 — 200x the
fixture magnitudes, yet INSIDE the measured decimal-cast exact band
(|operand| <= 1e9; stable.py::SUM_DECIMAL records the band and the
r12 probes behind it, NOTES "EXTREME-MAGNITUDE PROBE").

This layer widens the VERIFIED domain of the differential contract:
223 keys hash-match with 1e8-magnitude events.value / lineitem
measures planted in the adversarial micro corpus. The three excluded
keys are the r12-measured portability boundary, pinned below so the
exclusion can never go stale:

* ``agg_trend_ols`` / ``agg_corr`` — the band constrains the CAST
  OPERAND, and their summands are PRODUCTS (value*day, qty*price):
  raw 1e8 pushes the operand to ~1e12, where DuckDB's float-scaled
  double->DECIMAL cast double-rounds differently from Spark's exact
  BigDecimal path; their cancellation-amplifying closed forms
  (n*Sxy - Sx*Sy) then surface the ulp-level summand divergence in
  unrounded output columns. (Keys whose closed forms ATTENUATE —
  dstddev's /n + sqrt + ROUND 6 — absorb a measured 5% summand
  divergence and stay green; they are in the 223.)
* ``agg_skew_kurtosis`` — its exact integer power sums overflow
  INT64 at raw ~1.7e8 (q^4): BOTH engines abort (Spark ANSI
  ARITHMETIC_OVERFLOW, DuckDB OutOfRangeException in the INT64
  multiply) — a symmetric refusal like the >=1e21 decimal band edge,
  not a divergence; pinned so the symmetric-abort claim stays
  measured.

The r13 out-of-domain round owns the fix (per-key operand-domain
preconditions, not one global band); when a key is fixed, its
divergence pin below FAILS, forcing this list back in sync.
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

# The r12-measured mid-band portability boundary (module docstring).
# Each carries a divergence pin below — a fixed key cannot sit here
# unnoticed.
MIDBAND_DIVERGENT_KEYS = {
    "agg_corr",
    "agg_skew_kurtosis",
    "agg_trend_ols",
}

MIDBAND_KEYS = sorted(
    set(PERTURBED_KEYS + PERTURBED_ONLY_KEYS) - MIDBAND_DIVERGENT_KEYS
)

# raw magnitudes ~1e8: inside the 1e9 cast band on the raw column,
# signs mixed so sums exercise cancellation (the exact plants the r12
# probe measured the divergences with)
_EVENT_MAGS = [1.2e8, -0.9e8, 3.4e8, -2.5e8, 4.9e8, 7.7e7]


def _midband_tables():
    tables = _micro_tables()
    ev = tables["events"].copy()
    for i, m in enumerate(_EVENT_MAGS):
        ev.loc[3 * i, "value"] = m
    tables["events"] = ev
    li = tables["lineitem"].copy()
    li.loc[0, "l_extendedprice"] = 2.3e8
    li.loc[1, "l_quantity"] = 1.7e8
    tables["lineitem"] = li
    return tables


@pytest.fixture(scope="module")
def midband_dir(tmp_path_factory) -> str:
    dst = tmp_path_factory.mktemp("midband_fixture")
    for name, df in _midband_tables().items():
        df.to_parquet(dst / f"{name}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def mbdb(midband_dir):
    import duckdb

    con = duckdb.connect()
    for name in _midband_tables():
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{midband_dir}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", MIDBAND_KEYS)
def test_midband_corpus_differential(spark, midband_dir, mbdb, key):
    got = QUERIES[key](spark, midband_dir).toPandas()
    want = mbdb.sql(ORACLES[key]).df()
    assert_frames_match(got, want, f"midband:{key}")


def test_midband_exclusions_still_diverge(spark, midband_dir, mbdb):
    """The exclusion list is real, not stale: each excluded key must
    still FAIL the differential on this corpus in its measured mode.
    When the r13 per-key domain preconditions land, this test fails
    first and the fixed key moves back into MIDBAND_KEYS."""
    # integer power sums: BOTH engines refuse at this magnitude — a
    # symmetric abort, pinned on each side
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        QUERIES["agg_skew_kurtosis"](spark, midband_dir).toPandas()
    with pytest.raises(Exception, match="Overflow|Out of Range"):
        mbdb.sql(ORACLES["agg_skew_kurtosis"]).df()

    # product-operand cast divergence amplified by the cancellation
    # closed forms: both run, values drift
    for key in ("agg_corr", "agg_trend_ols"):
        got = QUERIES[key](spark, midband_dir).toPandas()
        want = mbdb.sql(ORACLES[key]).df()
        with pytest.raises(AssertionError):
            assert_frames_match(got, want, f"midband:{key}")
